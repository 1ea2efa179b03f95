"""Reversible YCoCg-R color transform (behavioral parity: image.h:39-79).

Whole-image vectorized lifting pairs; truncating division semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tdiv2(a):
    return jax.lax.div(a, jnp.asarray(2, a.dtype))


def rgb_to_ycocg(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) int32 RGB -> YCoCg-R: U=R-B; T=B+U/2; V=G-T; Y=T+V/2."""
    R, G, B = img[..., 0], img[..., 1], img[..., 2]
    U = R - B
    T = B + _tdiv2(U)
    V = G - T
    Y = T + _tdiv2(V)
    return jnp.stack([Y, U, V], axis=-1)


def ycocg_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """Inverse, with the reference's decode-side clamps (image.h:41-43)."""
    Y = jnp.clip(img[..., 0], 0, 255)
    U = jnp.clip(img[..., 1], -255, 255)
    V = jnp.clip(img[..., 2], -255, 255)
    T = Y - _tdiv2(V)
    G = V + T
    B = T - _tdiv2(U)
    R = B + U
    return jnp.stack([R, G, B], axis=-1)
