"""Micro-probes for the Mosaic constructs used by the 2-D compaction
kernels: run each in a tiny standalone Pallas kernel on the real TPU and
compare against numpy.  Isolates miscompiles without paying the full
encoder's compile time."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend())


def run(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=False,
    )(*args)


R, N = 64, 1024
rng = np.random.default_rng(3)
x = rng.integers(0, 100, size=(R, N)).astype(np.int32)


def _excl_rows(col):
    x = col
    k = 1
    while k < R:
        x = x + jnp.concatenate(
            [jnp.zeros((k, 1), x.dtype), x[:-k, :]], axis=0)
        k *= 2
    return x - col


# --- probe 1: (R,R) @ (R,1) lower-triangular MXU prefix sum ---------------
def k1(x_hbm, o_hbm):
    v = x_hbm[:, :]
    col = jnp.sum(v, axis=1, keepdims=True, dtype=jnp.int32)
    o_hbm[:, :] = _excl_rows(col) + col * 0


o = run(k1, jax.ShapeDtypeStruct((R, 1), jnp.int32), jnp.asarray(x))
want = np.concatenate([[0], np.cumsum(x.sum(1))[:-1]]).astype(np.int32)
print("probe1 excl_rows:", "OK" if np.array_equal(np.asarray(o)[:, 0], want)
      else f"FAIL got {np.asarray(o)[:5,0]} want {want[:5]}")

# --- probe 2: scalar from double reduction --------------------------------
def k2(x_hbm, o_hbm):
    v = x_hbm[:, :]
    tot = jnp.sum(jnp.sum(v, axis=1, keepdims=True, dtype=jnp.int32),
                  axis=0)[0]
    o_hbm[:, :] = jnp.broadcast_to(tot, (1, 1))


o = run(k2, jax.ShapeDtypeStruct((1, 1), jnp.int32), jnp.asarray(x))
print("probe2 double reduce:", "OK" if int(np.asarray(o)[0, 0]) == int(x.sum())
      else f"FAIL got {int(np.asarray(o)[0,0])} want {int(x.sum())}")

# --- probe 3: dyn 8-row block load + static row slice ----------------------
def k3(x_hbm, o_hbm):
    def sub(sb, c):
        r0 = pl.multiple_of(sb * 8, 8)
        blk = x_hbm[pl.ds(r0, 8), :]
        rows = [blk[j:j + 1, :] * 2 + j for j in range(8)]
        o_hbm[pl.ds(r0, 8), :] = jnp.concatenate(rows, axis=0)
        return c

    jax.lax.fori_loop(0, R // 8, sub, jnp.int32(0))


o = run(k3, jax.ShapeDtypeStruct((R, N), jnp.int32), jnp.asarray(x))
want3 = x * 2 + (np.arange(R)[:, None] % 8)
print("probe3 block row slice:", "OK" if np.array_equal(np.asarray(o), want3)
      else "FAIL")

# --- probe 4: 2-D global iota ----------------------------------------------
def k4(x_hbm, o_hbm):
    gidx = (jax.lax.broadcasted_iota(jnp.int32, (R, N), 0) * N
            + jax.lax.broadcasted_iota(jnp.int32, (R, N), 1))
    o_hbm[:, :] = gidx


o = run(k4, jax.ShapeDtypeStruct((R, N), jnp.int32), jnp.asarray(x))
print("probe4 2d iota:", "OK" if np.array_equal(
    np.asarray(o), np.arange(R * N, dtype=np.int32).reshape(R, N)) else "FAIL")

# --- probe 5: lane concat write (R, 2N) ------------------------------------
def k5(x_hbm, o_hbm):
    v = x_hbm[:, :]
    o_hbm[:, :] = jnp.concatenate([v, v + 1], axis=1)


o = run(k5, jax.ShapeDtypeStruct((R, 2 * N), jnp.int32), jnp.asarray(x))
print("probe5 lane concat:", "OK" if np.array_equal(
    np.asarray(o), np.concatenate([x, x + 1], 1)) else "FAIL")

# --- probe 6: lane-axis log-step exclusive prefix sum on (R, N) ------------
def k6(x_hbm, o_hbm):
    v = x_hbm[:, :]
    acc = v
    k = 1
    while k < N:
        acc = acc + jnp.concatenate(
            [jnp.zeros((R, k), jnp.int32), acc[:, :-k]], axis=1)
        k *= 2
    o_hbm[:, :] = acc - v


o = run(k6, jax.ShapeDtypeStruct((R, N), jnp.int32), jnp.asarray(x))
want6 = (np.cumsum(x, axis=1) - x).astype(np.int32)
print("probe6 lane excl scan:", "OK" if np.array_equal(np.asarray(o), want6)
      else "FAIL")
print("DONE")
