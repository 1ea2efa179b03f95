"""Is a (nblk, 256) <-> (256, nblk) transpose cheaper for narrow dtypes?
Decides the VLI-scan relayout strategy (int16 params in, int8 orders out)."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

NBLK, BLOCK = 131072, 256
rng = np.random.default_rng(0)
x32 = jnp.asarray(rng.integers(0, 2**20, (NBLK, BLOCK)), jnp.int32)


def timed(name, fn, *args):
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.uint32)))
    int(g(*args))
    t0 = time.time()
    outs = [g(*args) for _ in range(4)]
    for o in outs:
        int(o)
    print(f"{name:28s} {(time.time()-t0)/4*1e3:8.1f} ms",
          file=sys.stderr, flush=True)


timed("transpose int32", lambda x: x.T + 1, x32)
timed("transpose int16", lambda x: x.astype(jnp.int16).T + 1, x32)
timed("transpose int8", lambda x: x.astype(jnp.int8).T + 1, x32)
timed("transpose back int8",
      lambda x: x.astype(jnp.int8).reshape(BLOCK, NBLK).T + 1, x32)

# --- Pallas tile transpose: DMA (128, 256) tiles, flip in VMEM ------------
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

TR, TC = 128, BLOCK


def _t_native(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].T


def _t_mxu(x_ref, o_ref):
    v = x_ref[:, :]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (TR, TR), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (TR, TR), 1)
           ).astype(jnp.int8)
    out = jnp.zeros((TC, TR), jnp.int32)
    for k in range(4):
        bk = ((v >> (8 * k)) & 0xFF).astype(jnp.int8)
        acc = jax.lax.dot_general(
            bk, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (TC, TR)
        out = out + ((acc & 0xFF) << (8 * k))
    o_ref[:, :] = out


def mk(kern):
    f = pl.pallas_call(
        kern,
        grid=(NBLK // TR,),
        in_specs=[pl.BlockSpec((TR, TC), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((TC, TR), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((TC, NBLK), jnp.int32),
    )
    return f


timed("pallas native .T", lambda x: mk(_t_native)(x) + 1, x32)
timed("pallas mxu transpose", lambda x: mk(_t_mxu)(x) + 1, x32)
xt = np.asarray(jax.jit(lambda x: mk(_t_mxu)(x))(x32))
print("mxu transpose exact:", np.array_equal(xt, np.asarray(x32).T),
      file=sys.stderr)
print("DONE", file=sys.stderr)
