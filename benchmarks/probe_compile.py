"""Time the remote stage-2 compile at one geometry (AOT, cache-aware)."""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np
from imagegen import random_image

import jax
import jax.numpy as jnp

from dwt_tpu.codec import encoder

size = int(sys.argv[1]) if len(sys.argv) > 1 else 640


def p(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


rng = np.random.default_rng(7)
img = random_image(rng, size, size, 3, "mixed")
enc = encoder.get_encoder(size, size, 3)
lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
T = int(stats["T"])
pT = encoder._bucket(T)
p("lowering", size, "T=", T, "bucket=", pT)
t0 = time.time()
lowered = enc._get_stage2(pT).lower(lin, stats)
p("lowered", round(time.time() - t0, 1))
t0 = time.time()
compiled = lowered.compile()
p("compiled", round(time.time() - t0, 1))
t0 = time.time()
words, total_bits, layer_ends = compiled(lin, stats)
tb = int(total_bits)
p("ran", round(time.time() - t0, 1), "bits=", tb)
