"""Mosaic probe: sublane->lane merging reshapes inside a kernel —
(256, 32) -> (8, 1024) and (32, 32) -> (1, 1024).  These decide the
Hilbert gather engine's tile-flatten strategy."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), file=sys.stderr, flush=True)


def run(kernel, out_shape, x, grid=None, inspec=None, outspec=None):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[inspec or pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=outspec or pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


rng = np.random.default_rng(0)
x = rng.integers(-2**31, 2**31, (256, 32), dtype=np.int64).astype(np.int32)


def k1(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].reshape(8, 1024)


try:
    o = run(k1, jax.ShapeDtypeStruct((8, 1024), jnp.int32), jnp.asarray(x))
    ok = np.array_equal(np.asarray(o), x.reshape(8, 1024))
    print("reshape (256,32)->(8,1024):", "OK" if ok else "WRONG",
          file=sys.stderr, flush=True)
except Exception as e:  # noqa: BLE001
    print("reshape (256,32)->(8,1024): FAIL", str(e)[:200],
          file=sys.stderr, flush=True)


def k2(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].reshape(1, 1024)


try:
    o = run(k2, jax.ShapeDtypeStruct((1, 1024), jnp.int32),
            jnp.asarray(x[:32]))
    ok = np.array_equal(np.asarray(o), x[:32].reshape(1, 1024))
    print("reshape (32,32)->(1,1024):", "OK" if ok else "WRONG",
          file=sys.stderr, flush=True)
except Exception as e:  # noqa: BLE001
    print("reshape (32,32)->(1,1024): FAIL", str(e)[:200],
          file=sys.stderr, flush=True)


# Timing: K reshapes in a loop (is the relayout cheap enough for ~8K/level?)
def k3(x_ref, o_ref):
    def body(i, c):
        v = x_ref[:, :].reshape(8, 1024) + i
        o_ref[:, :] = v
        return c

    jax.lax.fori_loop(0, 1000, body, jnp.int32(0))


try:
    f = pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    g = jax.jit(lambda a: jnp.sum(f(a).astype(jnp.uint32)))
    int(g(jnp.asarray(x)))
    t0 = time.time()
    outs = [g(jnp.asarray(x)) for _ in range(3)]
    for o in outs:
        int(o)
    dt = (time.time() - t0) / 3 / 1000
    print(f"reshape (256,32)->(8,1024): {dt*1e9:.0f} ns per 8K elements",
          file=sys.stderr, flush=True)
except Exception as e:  # noqa: BLE001
    print("reshape timing: FAIL", str(e)[:200], file=sys.stderr, flush=True)
print("DONE", file=sys.stderr, flush=True)
