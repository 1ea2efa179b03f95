"""Hybrid decoder: native bit parsing + TPU inverse pipeline.

Stage 1 (host, C++): serial entropy parse of the stream into linearized
coefficients (dwt_tpu/runtime/native.py — decode parsing is inherently
sequential per stream; many-stream parallelism comes from the tiled
container format, not from within one stream).

Stage 2 (TPU, jitted): missing-plane midpoint bias (decode.c:50-58),
inverse Hilbert scatter (one gather with the cached permutation), inverse
multi-level lifting, inverse color transform, clamp.

Truncation / reduced-resolution semantics follow decode.c:136-268: output
size is the deepest level actually decoded; a stream that dies inside the
root band is a hard error.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import compute_pyramid
from ..hilbert import level_of_position, reconstruction_perm
from ..ops.color import ycocg_to_rgb
from ..ops.lifting import cdf53_inv, dwt2d_inv
from ..runtime import native


def parse_header(stream: bytes) -> tuple:
    if len(stream) < 6 or stream[0] != ord("W") or stream[1] not in (ord("5"), ord("6")):
        raise ValueError("bad header")
    gray = stream[1] == ord("5")
    W = stream[2] + (stream[3] << 8) + 1
    H = stream[4] + (stream[5] << 8) + 1
    return W, H, gray


@functools.lru_cache(maxsize=256)
def _tail_fn(width: int, height: int, out_levels: int, channels: int,
             gray: bool, engine: bool | None = None):
    """Jitted inverse pipeline for one (geometry, decoded-level) combination.

    ``engine=False`` forces the XLA gather tail — required when the result
    is vmapped (_tail_batch_fn): the Pallas scatter engine's ANY-space
    blocks cannot take a leading batch dimension."""
    pyr = compute_pyramid(width, height)
    outW, outH = pyr.widths[out_levels], pyr.heights[out_levels]
    n_out = pyr.pixels[out_levels]
    C = channels

    if out_levels == 0:
        # Root-only decode: the reference still runs one inverse lifting pass
        # at root size (decode.c:258 quirk, SURVEY §2.5).
        @jax.jit
        def tail(coeffs, missing):
            x = coeffs[:, :n_out].T.reshape(outH, outW, C).astype(jnp.int32)
            x = cdf53_inv(x, axis=0)
            x = cdf53_inv(x, axis=1)
            if not gray:
                x = ycocg_to_rgb(x)
            return jnp.clip(x, 0, 255).astype(jnp.uint8)

        return tail

    # The level chain of the reduced pyramid coincides with the original's
    # lower levels, so scan order and lifting geometry are shared.
    sub_pyr = compute_pyramid(outW, outH)
    assert sub_pyr.levels == out_levels
    from ..codec.encoder import _use_engine
    from ..hilbert import tile_plan
    from ..ops.pallas_hilbert import hilbert_scatter_pallas

    # Inverse Hilbert scatter: the Pallas tile engine on TPU (constant
    # one-hot MXU matmuls over the decoder's unpadded scan layout), one
    # XLA gather elsewhere.
    use_engine = (_use_engine() if engine is None else engine) \
        and min(outH, outW) >= 32
    plan = tile_plan(sub_pyr, 1) if use_engine else None
    inv_perm = jnp.asarray(reconstruction_perm(sub_pyr))
    lvl_of = jnp.asarray(level_of_position(pyr)[:n_out])

    @jax.jit
    def tail(coeffs, missing):
        # coeffs: (C, total>=n_out) int32 signed; missing: (C, 16)
        lin = coeffs[:, :n_out]
        # Midpoint bias for planes lost to truncation: push nonzero detail
        # coefficients away from zero by 2^(missing-2) (decode.c:50-58).
        # The 16-entry `missing` table expands via one compare-select per
        # level instead of a 25M-index take_along_axis (XLA gather costs
        # ~8 ns/index on TPU — it was the single largest inverse-tail op).
        bias_l = jnp.where(
            missing >= 2,
            jnp.left_shift(1, jnp.clip(missing - 2, 0, 30)), 0
        ).astype(jnp.int32)  # (C, 16) per-level bias magnitude
        bias = jnp.zeros((C, n_out), jnp.int32)
        for l in range(out_levels):
            bias = jnp.where(lvl_of[None, :] == l, bias_l[:, l : l + 1], bias)
        lin = lin + jnp.sign(lin) * bias
        if use_engine:
            x = hilbert_scatter_pallas(lin, plan, outH, outW, C)
            h0, w0 = sub_pyr.heights[0], sub_pyr.widths[0]
            root = lin[:, : sub_pyr.pixels[0]].T.reshape(h0, w0, C)
            x = jax.lax.dynamic_update_slice(x, root, (0, 0, 0))
        else:
            x = lin[:, inv_perm].T.reshape(outH, outW, C)
        x = dwt2d_inv(x, sub_pyr)
        if not gray:
            x = ycocg_to_rgb(x)
        return jnp.clip(x, 0, 255).astype(jnp.uint8)

    return tail


@functools.lru_cache(maxsize=256)
def _tail_batch_fn(width: int, height: int, out_levels: int, channels: int,
                   gray: bool):
    """vmapped inverse pipeline for a batch of same-geometry tiles."""
    tail = _tail_fn(width, height, out_levels, channels, gray, engine=False)
    return jax.jit(jax.vmap(tail))


def decode_batch(payloads: list, width: int, height: int, gray: bool,
                 pixels_max: int = 0, nthreads: int = 0) -> list:
    """Decode many same-geometry headerless payloads: thread-pooled native
    parse + one vmapped TPU inverse per decoded-level group.

    Returns a list of (H', W', C) uint8 images (size depends on how far
    each stream decoded). Hard-failed streams (truncated inside the root
    band) come back as None.
    """
    C = 1 if gray else 3
    pyr = compute_pyramid(width, height)
    levels_max = pyr.levels
    if pixels_max > 0:
        while levels_max > 0 and pyr.pixels[levels_max] > pixels_max:
            levels_max -= 1
    coeffs, missing, level, planes, rc = native.entropy_decode_batch(
        payloads, C, pyr.levels, levels_max, pyr.pixels, nthreads)
    out = [None] * len(payloads)
    for lv in np.unique(level):
        idx = np.nonzero((level == lv) & (rc == 0))[0]
        if idx.size == 0:
            continue
        fn = _tail_batch_fn(width, height, int(lv) + 1, C, gray)
        imgs = np.asarray(fn(jnp.asarray(coeffs[idx]),
                             jnp.asarray(missing[idx])))
        for j, i in enumerate(idx):
            out[int(i)] = imgs[j]
    return out


def decode(stream: bytes, pixels_max: int = 0) -> tuple:
    """Full decoder; returns (image uint8 (H, W, C), gray).

    Auto-detects the tiled .dwtt container (the format encoder.encode
    routes oversized images to), so encode/decode stay one API pair."""
    if stream[:2] == b"WT":
        from . import tiled

        return tiled.decode_tiled(stream, pixels_max=pixels_max)
    W, H, gray = parse_header(stream)
    C = 1 if gray else 3
    pyr = compute_pyramid(W, H)
    levels_max = pyr.levels
    if pixels_max > 0:
        while levels_max > 0 and pyr.pixels[levels_max] > pixels_max:
            levels_max -= 1

    coeffs, missing, level, planes = native.entropy_decode(
        stream[6:], C, pyr.levels, levels_max, pyr.pixels)
    out_levels = level + 1
    tail = _tail_fn(W, H, out_levels, C, gray)
    img = np.asarray(tail(jnp.asarray(coeffs), jnp.asarray(missing)))
    return img, gray
