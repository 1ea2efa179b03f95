"""Instrumented single-geometry encode probe (bisection aid)."""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

W = int(os.environ.get("PROBE_W", "1024"))
H = int(os.environ.get("PROBE_H", "1024"))


def p(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


import numpy as np
from imagegen import random_image

rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")
p("image ready", W, H)

from dwt_tpu.codec import encoder
import jax.numpy as jnp

t0 = time.time()
enc = encoder.get_encoder(W, H, 3)
p("ctor", round(time.time() - t0, 1))

t0 = time.time()
lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
T = int(stats["T"])
p("stage1", round(time.time() - t0, 1), "T=", T, "bucket=", encoder._bucket(T))

t0 = time.time()
st2 = enc._get_stage2(encoder._bucket(T))
words, total_bits, layer_ends = st2(lin, stats)
tb = int(total_bits)
p("stage2 compile+run", round(time.time() - t0, 1), "bits=", tb)

t0 = time.time()
stream = enc.encode(img)
p("encode", round(time.time() - t0, 1), "len=", len(stream))

import oracle
from dwt_tpu.io.pnm import pnm_bytes

t0 = time.time()
want = oracle.ref_encode(pnm_bytes(img))
p("oracle", round(time.time() - t0, 1), "len=", len(want))
if stream == want:
    p("MATCH")
else:
    n = min(len(stream), len(want))
    i = next((k for k in range(n) if stream[k] != want[k]), n)
    p("MISMATCH first-diff:", i, "lens:", len(stream), len(want))
    sys.exit(1)
