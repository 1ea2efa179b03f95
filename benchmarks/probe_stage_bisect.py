"""Stage-by-stage TPU-vs-CPU bisection of an encode mismatch.

Phase "cpu" (JAX_PLATFORMS=cpu subprocess): run the XLA fallback pipeline
(bit-exact to the reference C per CI) and save every intermediate.
Phase "tpu": run each production kernel in isolation on the same inputs
and report the FIRST stage whose output diverges.  Isolated kernels
compile in seconds-to-minutes; the fused stage-2 takes ~20 min at 1024
through the relay, so this is the cheap path to attribution.

Usage: python benchmarks/probe_stage_bisect.py [W H]
"""

import functools
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
NPZ = f"/tmp/bisect_cpu_{W}x{H}.npz"


def p(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def make_inputs():
    import numpy as np
    from imagegen import random_image

    rng = np.random.default_rng(7)
    return random_image(rng, W, H, 3, "mixed")


def cpu_phase():
    import numpy as np
    import jax.numpy as jnp

    from dwt_tpu.codec import encoder as E

    img = make_inputs()
    enc = E.get_encoder(W, H, 3)
    lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
    T = int(stats["T"])
    padded_T = E._bucket(T)
    pyr, C = enc.pyr, 3
    nwords = E._stream_words(pyr, C, padded_T)
    zp, sgn = E._sig_tokens_xla(lin, stats, pyr, C, padded_T)
    tv, tr, tf = E._finish_tokens(zp, sgn, lin, stats, pyr, C, padded_T)
    orders = E._vli_orders(tv, tf, padded_T)
    words, total_bits, off, off_base = E._pack_bits(
        lin, stats, tv, tr, tf, orders, pyr, C, padded_T, nwords)
    words_f = E._pack_ref_bits(words, off_base, lin, stats, pyr, C)
    np.savez(
        NPZ, lin=np.asarray(lin), T=T, padded_T=padded_T,
        zp=np.asarray(zp), sgn=np.asarray(sgn),
        tv=np.asarray(tv), tr=np.asarray(tr), tf=np.asarray(tf),
        orders=np.asarray(orders), off=np.asarray(off),
        off_base=np.asarray(off_base), words=np.asarray(words),
        words_f=np.asarray(words_f), total_bits=int(total_bits),
        **{f"st_{k}": np.asarray(v) for k, v in stats.items()},
    )
    p("cpu phase saved", NPZ)


def _cmp(name, got, want):
    import numpy as np

    got = np.asarray(got)
    want = np.asarray(want)
    if got.shape != want.shape:
        p(f"{name}: SHAPE {got.shape} vs {want.shape}")
        return False
    if np.array_equal(got, want):
        p(f"{name}: ok")
        return True
    bad = np.nonzero((got != want).reshape(-1))[0]
    i = int(bad[0])
    p(f"{name}: MISMATCH {len(bad)} elems; first flat={i} "
      f"got={got.reshape(-1)[i]} want={want.reshape(-1)[i]}")
    return False


def tpu_phase():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from dwt_tpu.codec import encoder as E
    from dwt_tpu.runtime import cache

    cache.enable()
    ref = np.load(NPZ)
    img = make_inputs()
    enc = E.get_encoder(W, H, 3)
    pyr, C = enc.pyr, 3
    t0 = time.time()
    lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
    lin.block_until_ready()
    p("stage1", round(time.time() - t0, 1))
    ok_lin = _cmp("lin (gather engine + lifting)", lin, ref["lin"])
    for k in ("T", "planes_max", "carry_end", "nref_total", "step_base",
              "inj_pos", "refpfx", "base_sched", "nS_sched"):
        _cmp(f"stats[{k}]", stats[k], ref[f"st_{k}"])
    if not ok_lin:
        p("lin differs -- downstream comparisons use the CPU lin")
        lin = jnp.asarray(ref["lin"])
        stats = {k[3:]: jnp.asarray(ref[k]) for k in ref.files
                 if k.startswith("st_")}
    padded_T = int(ref["padded_T"])
    nwords = E._stream_words(pyr, C, padded_T)

    # --- kernel A ---------------------------------------------------------
    t0 = time.time()
    fA = jax.jit(functools.partial(
        E._sig_tokens_pallas, pyr=pyr, channels=C, padded_T=padded_T))
    zp, sgn, vmag, com = fA(lin, stats)
    zp.block_until_ready()
    p("kernel A", round(time.time() - t0, 1))
    _cmp("A zp", zp, ref["zp"])
    _cmp("A sgn", sgn, ref["sgn"])

    # --- finish tokens (XLA) ----------------------------------------------
    t0 = time.time()
    fF = jax.jit(functools.partial(
        E._finish_tokens, pyr=pyr, channels=C, padded_T=padded_T))
    tv, tr, tf = fF(jnp.asarray(ref["zp"]), jnp.asarray(ref["sgn"]), lin,
                    stats)
    tv.block_until_ready()
    p("finish", round(time.time() - t0, 1))
    _cmp("tok_val", tv, ref["tv"])
    _cmp("tok_raw", tr, ref["tr"])
    _cmp("tok_vli", tf, ref["tf"])

    # --- VLI orders (engine transpose on TPU) -----------------------------
    t0 = time.time()
    fV = jax.jit(functools.partial(E._vli_orders, padded_T=padded_T))
    orders = fV(jnp.asarray(ref["tv"]), jnp.asarray(ref["tf"]))
    orders.block_until_ready()
    p("vli orders", round(time.time() - t0, 1))
    _cmp("orders", orders, ref["orders"])

    # --- pack (Pallas pack kernel) ----------------------------------------
    t0 = time.time()
    fP = jax.jit(functools.partial(
        E._pack_bits, pyr=pyr, channels=C, padded_T=padded_T, nwords=nwords))
    words, total_bits, off, off_base = fP(
        lin, stats, jnp.asarray(ref["tv"]), jnp.asarray(ref["tr"]),
        jnp.asarray(ref["tf"]), jnp.asarray(ref["orders"]))
    words.block_until_ready()
    p("pack", round(time.time() - t0, 1), "bits", int(total_bits),
      "want", int(ref["total_bits"]))
    _cmp("off", off, ref["off"])
    _cmp("off_base", off_base, ref["off_base"])
    _cmp("words (pre-ref)", words, ref["words"])

    # --- kernel B (refinement bits) ----------------------------------------
    t0 = time.time()
    fB = jax.jit(functools.partial(
        E._ref_bits_pallas, pyr=pyr, channels=C, padded_T=padded_T))
    words_f = fB(jnp.asarray(ref["words"]), jnp.asarray(ref["off_base"]),
                 vmag, com, stats)
    words_f.block_until_ready()
    p("kernel B", round(time.time() - t0, 1))
    _cmp("words (final)", words_f, ref["words_f"])


if __name__ == "__main__":
    if os.environ.get("BISECT_PHASE") == "cpu":
        cpu_phase()
    else:
        if not os.path.exists(NPZ):
            p("running cpu phase...")
            env = dict(os.environ, BISECT_PHASE="cpu", JAX_PLATFORMS="cpu")
            subprocess.run([sys.executable, __file__] + sys.argv[1:],
                           env=env, check=True)
        tpu_phase()
