"""Probe: scalar-from-(1,)-sum + pl.when under GLOBAL x64 (the config the
codec runs with).  Bare jnp.sum to a scalar is broken in this config
(Mosaic's proxy re-trace promotes i32 sums to i64)."""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), "x64:", jax.config.jax_enable_x64)


def kernel(x_ref, o_ref):
    def body(s, carry):
        v = x_ref[:, pl.ds(s * 256, 256)]
        m = ((v >> 3) & 1).astype(jnp.int32)
        cnt = jnp.sum(m, axis=1, dtype=jnp.int32)[0]  # (1,) -> scalar

        @pl.when(cnt > 0)
        def _():
            o_ref[:, pl.ds(s * 256, 256)] = m + carry

        return carry + cnt

    total = jax.lax.fori_loop(0, 4, body, jnp.int32(0))
    o_ref[:, :1] = jnp.full((1, 1), total, jnp.int32)


x = jnp.arange(1024, dtype=jnp.int32).reshape(1, 1024)
with jax.enable_x64(False):
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.int32),
        in_specs=[pl.BlockSpec((1, 1024), lambda: (0, 0))],
        out_specs=pl.BlockSpec((1, 1024), lambda: (0, 0)),
    )(x)
out = np.asarray(out)
m = (np.arange(1024) >> 3) & 1
print("total:", out[0, 0], "want:", m.sum())
print("OK" if out[0, 0] == m.sum() else "MISMATCH")
