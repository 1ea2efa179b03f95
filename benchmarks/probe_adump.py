"""Dump kernel A's device output for probe_akernel analysis (TPU)."""
import functools
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np
import jax
import jax.numpy as jnp

from dwt_tpu.codec import encoder as E
from dwt_tpu.geometry import compute_pyramid
from dwt_tpu.runtime import cache

cache.enable()
W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
ref = np.load(f"/tmp/bisect_cpu_{W}x{H}.npz")
pyr = compute_pyramid(W, H)
stats = {k[3:]: jnp.asarray(ref[k]) for k in ref.files if k.startswith("st_")}
lin = jnp.asarray(ref["lin"])
padded_T = int(ref["padded_T"])
fA = jax.jit(functools.partial(
    E._sig_tokens_pallas, pyr=pyr, channels=3, padded_T=padded_T))
zp, sgn, _, _ = fA(lin, stats)
np.savez(f"/tmp/bisect_tpu_{W}x{H}.npz", zp=np.asarray(zp),
         sgn=np.asarray(sgn))
nbad = int(np.sum((np.asarray(zp) != ref["zp"]) | (np.asarray(sgn) != ref["sgn"])))
print("saved; bad pairs:", nbad, flush=True)
