"""Per-stage 4K encode timing with ONE relay sync per measurement:
enqueue N calls, sync ONLY the last scalar (device is FIFO, so the last
output completing implies all N finished).  Subtracts the single
roundtrip by measuring an empty pipeline of the same depth."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
import jax
import jax.numpy as jnp

from dwt_tpu.runtime import cache

cache.enable()
from imagegen import random_image
from dwt_tpu.codec import encoder
from dwt_tpu.codec.encoder import (_bucket, _finish_tokens, _pack_bits,
                                   _ref_bits_pallas, _sig_tokens_pallas,
                                   _stream_words, _vli_orders)

W, H = 3840, 2160
N = 10
rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")
enc = encoder.get_encoder(W, H, 3)
img_dev = jnp.asarray(img)
lin, stats = enc._stage1(img_dev, enc._perm)
T = int(stats["T"])
padded_T = _bucket(T)
pyr, C = enc.pyr, 3
nwords = _stream_words(pyr, C, padded_T)
print(f"T={T} padded_T={padded_T}", flush=True)


def timed(name, fn, *args):
    g = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.uint32))
                               for x in jax.tree.leaves(fn(*a))))
    int(g(*args))  # compile + warm
    int(g(*args))
    t0 = time.time()
    outs = [g(*args) for _ in range(N)]
    int(outs[-1])  # ONE sync: device FIFO implies all N done
    dt = (time.time() - t0) / N
    print(f"{name:30s} {dt*1e3:8.1f} ms", flush=True)
    return jax.jit(fn)(*args)


# roundtrip floor: empty-ish op
timed("sync floor (tiny op)", lambda x: x + 1, jnp.zeros((8,), jnp.int32))

lin, stats = timed("stage1", lambda im: enc._stage1(im, enc._perm), img_dev)
zpA, sgA, vmag, com = timed(
    "A: sig-token compaction",
    lambda lin, stats: _sig_tokens_pallas(lin, stats, pyr, C, padded_T),
    lin, stats)
tv, tr, tf = timed(
    "finish tokens",
    lambda zp, sg, lin, stats: _finish_tokens(zp, sg, lin, stats, pyr, C,
                                              padded_T),
    zpA, sgA, lin, stats)
orders = timed("VLI order scan",
               lambda tv, tf: _vli_orders(tv, tf, padded_T), tv, tf)
words, total_bits, off, off_base = timed(
    "pack bits",
    lambda lin, stats, tv, tr, tf, o: _pack_bits(
        lin, stats, tv, tr, tf, o, pyr, C, padded_T, nwords),
    lin, stats, tv, tr, tf, orders)
timed("B: refinement bits",
      lambda words, ob, vmag, stats: _ref_bits_pallas(
          words, ob, vmag, com, stats, pyr, C, padded_T),
      words, off_base, vmag, stats)

# full split pipeline, one sync per frame batch
st2 = enc._get_stage2(padded_T)
cks = jax.jit(lambda w, tb: (jnp.sum(w, dtype=jnp.uint32), tb))


def full(im):
    l, s = enc._stage1(im, enc._perm)
    w, tb, _ = st2(l, s)
    return cks(w, tb)


cs, tb = full(img_dev)
int(cs)
t0 = time.time()
outs = [full(img_dev) for _ in range(N)]
int(outs[-1][0])
dt = (time.time() - t0) / N
print(f"{'FULL encode pipeline':30s} {dt*1e3:8.1f} ms "
      f"({W*H/1e6/dt:.1f} MP/s)", flush=True)
