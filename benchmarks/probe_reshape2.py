"""Micro-probe: is an in-kernel (8, 1024) -> (1, 8192) int32 reshape
exact on this Mosaic build?  (Used by the gather engine's obuf store.)"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, TSQ = 8, 1024


def kern(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].reshape(1, G * TSQ)


x = np.arange(G * TSQ, dtype=np.int32).reshape(G, TSQ)
with jax.enable_x64(False):
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, G * TSQ), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
o = np.asarray(out).reshape(-1)
ok = np.array_equal(o, np.arange(G * TSQ, dtype=np.int32))
print("reshape exact:", ok)
if not ok:
    bad = np.where(o != np.arange(G * TSQ))[0]
    print("n bad:", len(bad), "first:", bad[:8])
    print("got:", o[bad[:8]], "want:", bad[:8])
sys.exit(0 if ok else 1)
