"""TPU A/B debug: compare each Pallas compaction kernel's output against
the XLA fallback on a small image, reporting first-mismatch locations and
the owning unit's metadata.  Isolates which kernel (and which unit shape)
diverges without decoding streams."""
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

rng = np.random.default_rng(42)
img = random_image(rng, 64, 64, 3, "noise")
enc = encoder.get_encoder(64, 64, 3)
pyr, C = enc.pyr, 3

lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
padded_T = _bucket(int(stats["T"]))
nwords = _stream_words(pyr, C, padded_T)

tokP, vmag, com = jax.jit(
    lambda lin, stats: _sig_tokens_pallas(lin, stats, pyr, C, padded_T)
)(lin, stats)
tokX = jax.jit(
    lambda lin, stats: _sig_tokens_xla(lin, stats, pyr, C, padded_T)
)(lin, stats)
tp, tx = np.asarray(tokP), np.asarray(tokX)
bad = np.nonzero(tp != tx)[0]
print(f"kernel A: {bad.size} mismatching token slots of {padded_T}", flush=True)
meta_dbg = None
if bad.size:
    print("  first bad slots:", bad[:10])
    print("  got ", tp[bad[:10]])
    print("  want", tx[bad[:10]])

# Continue from the XLA tokens so kernel B is tested in isolation.
tv, tr, tf = jax.jit(
    lambda tok0, lin, stats: _finish_tokens(tok0, lin, stats, pyr, C, padded_T)
)(tokX, lin, stats)
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
    print("  first bad words:", badw[:10])
    for i in badw[:4]:
        print(f"  word {i}: got {wp[i]:08x} want {wx[i]:08x} "
              f"xor {wp[i]^wx[i]:08x}")
print("DONE", flush=True)
