"""Isolated device timing of the stage-2 Pallas kernels (A, B, pack).

The full stage-2 programs take tens of minutes to compile through the
relay-attached TPU backend, which makes kernel tuning by full-pipeline
rebench ~1 iteration/hour.  This probe splits the loop:

  1. `dump` phase (run with JAX_PLATFORMS=cpu): encode a real 4K image
     through the XLA-fallback pipeline ONCE and save every kernel input
     (packed element rows, unit metadata, token codeword contributions,
     word indices) to /tmp.  Byte-identical semantics guarantee the
     captured inputs match what the TPU kernels see in production.
  2. `time` phase (TPU): load the dump, jit JUST the pallas_call wrappers
     (they compile in seconds — the XLA wrapping is trivial), and time
     each kernel with scalar-sync-only measurement.

Usage:
    JAX_PLATFORMS=cpu python benchmarks/probe_kperf.py dump [W H]
    python benchmarks/probe_kperf.py time [W H]
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np

W = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
H = int(sys.argv[3]) if len(sys.argv) > 3 else 2160
NPZ = f"/tmp/kperf_{W}x{H}.npz"


def p(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def dump():
    assert "cpu" in os.environ.get("JAX_PLATFORMS", ""), \
        "dump must run on CPU (JAX_PLATFORMS=cpu)"
    # The axon TPU plugin programmatically forces the tunneled TPU platform,
    # overriding JAX_PLATFORMS env — override it back (see tests/conftest).
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from imagegen import random_image

    from dwt_tpu.codec import encoder as E

    rng = np.random.default_rng(7)  # same content as bench.py
    img = random_image(rng, W, H, 3, "mixed")
    enc = E.get_encoder(W, H, 3)
    p("stage1...")
    lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
    T = int(stats["T"])
    padded_T = E._bucket(T)
    pyr, C = enc.pyr, 3
    p(f"T={T} padded_T={padded_T}")

    segs = E._Segs(pyr)
    com = E._unit_common(stats, segs, pyr, C)
    vmag = E._packed_elems(lin, segs)

    # Kernel metadata + codeword contributions via the ENCODER'S OWN
    # builders (_kernel_a_meta/_kernel_b_meta/_codeword_contribs): the
    # probe can never desynchronize from the production meta layout
    # (ADVICE r4: a previous copy of these expressions could).
    meta_a, pairbuf = E._kernel_a_meta(stats, segs, com, padded_T)

    p("stage2 tokens (XLA fallback)...")
    tv, tr, tf, orders = E._stage2_tokens(lin, stats, pyr, C, padded_T)
    p("pack inputs...")
    (nbits, nref_step, off, refstart, widx, c0, c1, c2) = \
        E._codeword_contribs(stats, tv, tr, tf, orders, padded_T)
    nwords = E._stream_words(pyr, C, padded_T)
    meta_b = E._kernel_b_meta(stats, segs, com, refstart, pyr, padded_T,
                              nwords)

    np.savez_compressed(
        NPZ, vmag=np.asarray(vmag), meta_a=np.asarray(meta_a),
        tv=np.asarray(tv), tf=np.asarray(tf),
        meta_b=np.asarray(meta_b), widx=np.asarray(widx),
        c0=np.asarray(c0), c1=np.asarray(c1), c2=np.asarray(c2),
        nwords=np.int64(nwords), pairbuf=np.int64(pairbuf),
        padded_T=np.int64(padded_T))
    p(f"dumped {NPZ}")


def timeit():
    import jax
    import jax.numpy as jnp

    from dwt_tpu.runtime import cache

    cache.enable()
    from dwt_tpu.ops import pallas_compact as pc
    from dwt_tpu.ops import pallas_pack as pp

    z = np.load(NPZ)
    p(f"loaded {NPZ}; backend={jax.default_backend()}")
    vmag = jnp.asarray(z["vmag"])
    meta_a = jnp.asarray(z["meta_a"])
    meta_b = jnp.asarray(z["meta_b"])
    widx, c0, c1, c2 = (jnp.asarray(z[k]) for k in ("widx", "c0", "c1", "c2"))
    nwords = int(z["nwords"])
    pairbuf = int(z["pairbuf"])

    def bench(name, fn, *args, n=5):
        # Chain iterations through an accumulator and sync ONLY the final
        # scalar: the dev relay charges ~25 ms per value fetch (not per
        # program), so per-call syncs would add a constant offset to every
        # measurement.  The single residual fetch is subtracted.
        f = jax.jit(lambda prev, *a: fn(*a).astype(jnp.uint32) + prev)
        acc = f(jnp.uint32(0), *args)
        int(acc)  # warm + sync
        t0 = time.time()
        acc = jnp.uint32(0)
        for _ in range(n):
            acc = f(acc, *args)
        int(acc)
        dt = (time.time() - t0 - 0.025) / n * 1000
        p(f"{name}: {dt:.1f} ms")
        return dt

    pair0 = jnp.zeros((1, pairbuf), jnp.int32)
    bench("kernel A (compact_tokens)",
          lambda v, m, t0_: jnp.sum(
              pc.compact_tokens_pallas(v, m, t0_), dtype=jnp.uint32),
          vmag, meta_a, pair0)
    bench("pack (pack_words)",
          lambda w, a, b, c: jnp.sum(
              pp.pack_words_pallas(w, a, b, c, nwords), dtype=jnp.uint32),
          widx, c0, c1, c2)
    words0 = jnp.zeros((1, nwords), jnp.uint32)
    bench("kernel B (scatter_refbits)",
          lambda v, m, w: jnp.sum(
              pc.scatter_refbits_pallas(v, m, w), dtype=jnp.uint32),
          vmag, meta_b, words0)


if __name__ == "__main__":
    {"dump": dump, "time": timeit}[sys.argv[1]]()
