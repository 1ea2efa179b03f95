"""TPU A/B debug: compare each Pallas compaction kernel's output against
the XLA fallback, reporting first-mismatch locations.  Isolates which
kernel (and which placement tier) diverges without decoding streams.

Cases sweep row density: "noise" drives the sparse split tiers,
"checker" saturates rows (alternating 0/255 columns give one dominant
bitplane -> ~full 1024-element rows through the dense ADIRECT tiers that
a 4K bench hits), "mixed" covers the in-between.  All cases share one
geometry so stage-1 compiles once; per-bucket stage jits hit the
persistent compile cache on repeats.
"""
import sys

import numpy as np

sys.path.insert(0, "tests")
from imagegen import random_image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dwt_tpu.codec import encoder  # noqa: E402
from dwt_tpu.codec.encoder import (_bucket, _finish_tokens, _pack_bits,  # noqa: E402
                                   _pack_ref_bits, _ref_bits_pallas,
                                   _sig_tokens_pallas, _sig_tokens_xla,
                                   _stream_words, _vli_orders)

print("backend:", jax.default_backend(), flush=True)

W = H = 512
rng = np.random.default_rng(42)
checker = np.zeros((H, W, 3), np.uint8)
checker[:, ::2] = 255
CASES = [
    ("noise", random_image(rng, W, H, 3, "noise")),
    ("checker", checker),
    ("mixed", random_image(rng, W, H, 3, "mixed")),
]

enc = encoder.get_encoder(W, H, 3)
pyr, C = enc.pyr, 3
fail = 0

for name, img in CASES:
    lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
    padded_T = _bucket(int(stats["T"]))
    nwords = _stream_words(pyr, C, padded_T)
    print(f"--- {name}: T={int(stats['T'])} padded_T={padded_T}", flush=True)

    zpP, sgP, vmag, com = jax.jit(
        lambda lin, stats: _sig_tokens_pallas(lin, stats, pyr, C, padded_T)
    )(lin, stats)
    zpX, sgX = jax.jit(
        lambda lin, stats: _sig_tokens_xla(lin, stats, pyr, C, padded_T)
    )(lin, stats)
    tp = np.stack([np.asarray(zpP), np.asarray(sgP)], axis=-1)
    tx = np.stack([np.asarray(zpX), np.asarray(sgX)], axis=-1)
    bad = np.nonzero((tp != tx).any(-1))[0]
    print(f"kernel A: {bad.size} mismatching pair slots of {padded_T // 2}",
          flush=True)
    if bad.size:
        fail = 1
        print("  first bad slots:", bad[:10])
        print("  got ", tp[bad[:10]].tolist())
        print("  want", tx[bad[:10]].tolist())

    # Continue from the XLA pairs so kernel B is tested in isolation.
    tv, tr, tf = jax.jit(
        lambda zp, sg, lin, stats: _finish_tokens(zp, sg, lin, stats, pyr, C,
                                                  padded_T)
    )(zpX, sgX, lin, stats)
    orders = jax.jit(lambda tv, tf: _vli_orders(tv, tf, padded_T))(tv, tf)
    words, total_bits, off, off_base = jax.jit(
        lambda lin, stats, tv, tr, tf, o: _pack_bits(
            lin, stats, tv, tr, tf, o, pyr, C, padded_T, nwords)
    )(lin, stats, tv, tr, tf, orders)

    wP = jax.jit(
        lambda words, ob, vmag, stats: _ref_bits_pallas(
            words, ob, vmag, com, stats, pyr, C, padded_T)
    )(words, off_base, vmag, stats)
    wX = jax.jit(
        lambda words, ob, lin, stats: _pack_ref_bits(
            words, ob, lin, stats, pyr, C)
    )(words, off_base, lin, stats)
    wp, wx = np.asarray(wP), np.asarray(wX)
    badw = np.nonzero(wp != wx)[0]
    print(f"kernel B: {badw.size} mismatching words of {nwords}", flush=True)
    if badw.size:
        fail = 1
        print("  first bad words:", badw[:10])
        for i in badw[:4]:
            print(f"  word {i}: got {wp[i]:08x} want {wx[i]:08x} "
                  f"xor {wp[i]^wx[i]:08x}")

    # End-to-end stream gate for this content (full production pipeline,
    # all kernels + engines active).
    from dwt_tpu import specmodel

    got = enc.encode(img)
    want = specmodel.encode(img, gray=False)
    ok = got == want
    print(f"stream: {'byte-identical' if ok else 'MISMATCH'} "
          f"({len(got)} bytes)", flush=True)
    if not ok:
        fail = 1

print("DONE" if not fail else "FAILED", flush=True)
sys.exit(fail)
