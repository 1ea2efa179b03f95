"""Pallas TPU 2-D transpose via MXU identity matmuls.

XLA's transpose of large scan-major layouts ran shuffle-bound at ~29 ms
per 33.5M int32 on a v5e when this was written (round 2); the MXU path
here — a (TR, TC) tile contracted with a constant identity over its row
axis IS the transposed tile, s8 x s8 -> s32 exact per byte plane — cut
that ~4x.  As of jax 0.9 XLA's own transpose has caught up (3.6 vs
3.7 ms at the VLI scan's shapes, round-5 measurement), and plain .T also
vmaps cleanly where a pallas block spec cannot (batch axis mid-array), so
the production encoder no longer calls this; the module stays as the
documented technique with its tests.

The grid walks (TR, TC) input tiles; tile (i, j) writes output tile
(j, i).  Both dims must be multiples of the tile sizes — callers pad
(token counts are already multiples of the pack block; the row count pads
to TR with a concat and a slice, both bandwidth-cheap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False
TR = 128   # input tile rows
TC = 256   # input tile cols


def _eye(n):
    return (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            ).astype(jnp.int8)


def _t32_kernel(x_ref, o_ref):
    v = x_ref[:, :]
    eye = _eye(TR)
    out = jnp.zeros((TC, TR), jnp.int32)
    for k in range(4):
        bk = ((v >> (8 * k)) & 0xFF).astype(jnp.int8)
        acc = jax.lax.dot_general(
            bk, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (TC, TR) = tile^T bytes
        out = out | ((acc & 0xFF) << (8 * k))
    o_ref[:, :] = out


def _t8_kernel(x_ref, o_ref):
    v = x_ref[:, :]
    o_ref[:, :] = jax.lax.dot_general(
        v, _eye(TR), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.int8)


def transpose2d(x, interpret: bool | None = None):
    """(R, C) -> (C, R) for int32/uint32/int8, padding R to TR and C to TC
    internally.  Bit-exact (byte-plane identity matmuls)."""
    if interpret is None:
        interpret = INTERPRET
    R, C = x.shape
    Rp, Cp = -(-R // TR) * TR, -(-C // TC) * TC
    if (Rp, Cp) != (R, C):
        x = jnp.pad(x, ((0, Rp - R), (0, Cp - C)))
    if x.dtype in (jnp.int8,):
        kern, odt = _t8_kernel, jnp.int8
    else:
        kern, odt = _t32_kernel, jnp.int32
        if x.dtype != jnp.int32:
            x = jax.lax.bitcast_convert_type(x, jnp.int32)
    out = pl.pallas_call(
        kern,
        grid=(Rp // TR, Cp // TC),
        in_specs=[pl.BlockSpec((TR, TC), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((TC, TR), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((Cp, Rp), odt),
        interpret=interpret,
    )(x)
    return out[:C, :R]
