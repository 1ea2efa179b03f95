"""Stage-1 4K timing, engine vs XLA-gather fallback, on the real device.
Scalar-only sync (relay environment).  Usage: probe_s1time.py [W H]"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np
from imagegen import random_image

W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
    else (3840, 2160)

import jax
import jax.numpy as jnp
from dwt_tpu.codec import encoder
from dwt_tpu.runtime import cache

cache.enable()
rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")
img_dev = jnp.asarray(img)
enc = encoder.get_encoder(W, H, 3)
cks = jax.jit(lambda lin: jnp.sum(lin.astype(jnp.uint32), dtype=jnp.uint32))

t0 = time.time()
lin, stats = enc._stage1(img_dev, enc._perm)
dig = int(cks(lin))
print(f"engine={encoder._use_engine()} warm={time.time()-t0:.1f}s "
      f"T={int(stats['T'])} digest={dig:x}", flush=True)

N = 5
t0 = time.time()
outs = [enc._stage1(img_dev, enc._perm) for _ in range(N)]
vals = [cks(lin) for lin, _ in outs]
for v in vals:
    int(v)
dt = (time.time() - t0) / N
print(f"stage1: {dt*1e3:.1f} ms  ({W*H/1e6/dt:.1f} MP/s)", flush=True)
