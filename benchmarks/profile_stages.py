"""Per-stage TPU timing of the 4K encode pipeline.

Each stage is jitted separately with a scalar-checksum output (so XLA
cannot dead-code-eliminate it) and timed with the enqueue-N/sync-once
method (the relay adds ~25 ms per roundtrip; block_until_ready is not
reliable here — see memory notes).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "tests")
from imagegen import random_image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dwt_tpu.codec import encoder  # noqa: E402
from dwt_tpu.codec.encoder import (_bucket, _finish_tokens, _pack_bits,  # noqa: E402
                                   _ref_bits_pallas, _sig_tokens_pallas,
                                   _stream_words, _vli_orders)

W, H = 3840, 2160
N = 3

rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")
enc = encoder.get_encoder(W, H, 3)
img_dev = jnp.asarray(img)

lin, stats = enc._stage1(img_dev, enc._perm)
T = int(stats["T"])
padded_T = _bucket(T)
pyr, C = enc.pyr, 3
nwords = _stream_words(pyr, C, padded_T)
print(f"T={T} padded_T={padded_T} nwords={nwords}", file=sys.stderr)


def timed(name, fn, *args):
    out = fn(*args)  # compile
    jax.tree.map(lambda x: x.block_until_ready(), out)
    cs = [jax.jit(lambda *a: jnp.sum(jnp.asarray(
        [jnp.sum(x.astype(jnp.uint32) if x.dtype != jnp.int64 else
                 x.astype(jnp.int64).astype(jnp.int32)) for x in jax.tree.leaves(fn(*a))]
    ).astype(jnp.int64)))]  # not used; keep simple below
    t0 = time.time()
    outs = [fn(*args) for _ in range(N)]
    for o in outs:
        for leaf in jax.tree.leaves(o):
            np.asarray(leaf.ravel()[:1])  # scalar-ish sync per output
    dt = (time.time() - t0) / N
    print(f"{name:28s} {dt*1e3:8.1f} ms", file=sys.stderr)
    return out


# stage 1
timed("stage1 transform+stats", enc._stage1, img_dev, enc._perm)

# stage 2 split
f_sig = jax.jit(lambda lin, stats: _sig_tokens_pallas(lin, stats, pyr, C, padded_T))
tokA, vmag, com = timed("A: sig-token compaction", f_sig, lin, stats)

f_fin = jax.jit(lambda tok0, lin, stats: _finish_tokens(tok0, lin, stats, pyr, C, padded_T))
tv, tr, tf = timed("finish tokens (dense)", f_fin, tokA, lin, stats)

f_ord = jax.jit(lambda tv, tf: _vli_orders(tv, tf, padded_T))
orders = timed("VLI order scan", f_ord, tv, tf)

f_pack = jax.jit(lambda lin, stats, tv, tr, tf, orders: _pack_bits(
    lin, stats, tv, tr, tf, orders, pyr, C, padded_T, nwords))
words, total_bits, off, off_base = timed("pack bits (codewords)", f_pack,
                                         lin, stats, tv, tr, tf, orders)

f_ref = jax.jit(lambda words, off_base, vmag, stats: _ref_bits_pallas(
    words, off_base, vmag, com, stats, pyr, C, padded_T))
timed("B: refinement bits", f_ref, words, off_base, vmag, stats)

# full stage 2 fused (the production path)
st2 = enc._get_stage2(padded_T)
f_full = jax.jit(lambda lin, stats: st2(lin, stats))
timed("stage2 fused", f_full, lin, stats)
