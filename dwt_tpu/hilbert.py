"""Hilbert space-filling curve, vectorized over the whole curve at once.

The reference walks the curve one index at a time with an O(log n) scalar
loop per cell (reference: hilbert.h:15-34, called per-coefficient from
encode.c:46-57 — its hottest non-entropy loop).  Here the entire d->(x,y)
mapping for a 2^k x 2^k grid is computed once, vectorized in numpy, and the
resulting *linearization permutation* (a flat gather index array) is cached
per image geometry.  On device the whole linearization step then collapses
to a single ``take`` — no per-cell work ever runs on the TPU.
"""

from __future__ import annotations

import functools

import numpy as np

from .geometry import Pyramid


@functools.lru_cache(maxsize=None)
def hilbert_xy(n: int) -> tuple:
    """Vectorized index -> (x, y) for the full n*n Hilbert curve (n = 2^k).

    Returns (x, y) int32 arrays of length n*n such that (x[d], y[d]) is the
    cell visited at curve position d.  Matches reference hilbert.h:15-34
    bit-for-bit (bottom-up composition of quadrant rotations/reflections).
    """
    assert n >= 1 and (n & (n - 1)) == 0
    d = np.arange(n * n, dtype=np.int64)
    x = np.zeros(n * n, dtype=np.int64)
    y = np.zeros(n * n, dtype=np.int64)
    s = 1
    while s < n:
        rx = (d // 2) & 1
        ry = (d ^ rx) & 1
        # Within the ry==0 quadrants: reflect when rx==1, then swap x/y.
        flip = (ry == 0) & (rx == 1)
        x = np.where(flip, s - 1 - x, x)
        y = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        x += s * rx
        y += s * ry
        s *= 2
        d //= 4
    return x.astype(np.int32), y.astype(np.int32)


@functools.lru_cache(maxsize=None)
def linearization_perm(pyr: Pyramid) -> np.ndarray:
    """Flat gather indices realizing the reference coefficient scan order.

    ``linear[k] = coeff2d.reshape(-1)[perm[k]]`` reproduces the order of
    reference encode.c:32-58: root LL band in raster order, then for each
    level l the detail cells of level l+1 (inside its image, outside the
    level-l image) in Hilbert-curve order over the level's pow2 grid.

    Returns int32 array of length pyr.total indexing into the row-major
    (H, W) plane.  Inverse (scatter order for the decoder) is just argsort.
    """
    W = pyr.width
    parts = []
    # Root band: raster order over the coarsest LL.
    w0, h0 = pyr.widths[0], pyr.heights[0]
    yy, xx = np.mgrid[0:h0, 0:w0]
    parts.append((yy * W + xx).reshape(-1))
    # Detail bands per level, Hilbert order.
    for l in range(pyr.levels):
        n = pyr.lengths[l + 1]
        x, y = hilbert_xy(n)
        inside = (x < pyr.widths[l + 1]) & (y < pyr.heights[l + 1])
        outside_prev = (x >= pyr.widths[l]) | (y >= pyr.heights[l])
        keep = inside & outside_prev
        parts.append((y[keep].astype(np.int64) * W + x[keep]).astype(np.int64))
    perm = np.concatenate(parts).astype(np.int32)
    assert perm.shape[0] == pyr.total
    return perm


@functools.lru_cache(maxsize=None)
def reconstruction_perm(pyr: Pyramid) -> np.ndarray:
    """Inverse permutation: scatter linearized coefficients back to 2-D.

    ``coeff2d.reshape(-1)[j] = linear[inv[j]]``.
    """
    perm = linearization_perm(pyr)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=np.int32)
    return inv


@functools.lru_cache(maxsize=None)
def padded_layout(pyr: Pyramid, align: int = 512) -> tuple:
    """Lane-aligned scan-order layout for the TPU entropy pipeline.

    Each scan-order segment (root band, then one segment per detail level)
    is padded at its end to a multiple of ``align`` so that every segment
    boundary falls on a TPU-lane-aligned offset — segmented cumsums,
    broadcasts and reductions then never touch unaligned lane slices (a
    ~100x throughput cliff on TPU).  Pad slots gather image index 0 and are
    masked out of every mask/cumsum, so the produced bitstream is unchanged.

    Returns (perm, valid, seg_sizes_padded) where perm/valid have length
    root_pad + sum(padded detail sizes); seg_sizes_padded[0] is the padded
    root size.
    """
    perm = linearization_perm(pyr)
    parts_idx, parts_valid, sizes = [], [], []
    # segment 0 = root band [0, pixels[0]); segment l+1 = level-l details.
    segs = [(0, pyr.pixels[0])] + [
        (pyr.pixels[l], pyr.pixels[l + 1]) for l in range(pyr.levels)
    ]
    for a, b in segs:
        n = b - a
        pad = (-n) % align
        parts_idx.append(perm[a:b])
        parts_idx.append(np.zeros(pad, np.int32))
        v = np.zeros(n + pad, bool)
        v[:n] = True
        parts_valid.append(v)
        sizes.append(n + pad)
    return (np.concatenate(parts_idx), np.concatenate(parts_valid),
            tuple(sizes))


@functools.lru_cache(maxsize=None)
def level_of_position(pyr: Pyramid) -> np.ndarray:
    """For each linearized position, which pyramid chunk it belongs to.

    Root band positions get level -1; detail positions get l in [0, levels).
    """
    out = np.empty(pyr.total, dtype=np.int32)
    out[: pyr.pixels[0]] = -1
    for l in range(pyr.levels):
        out[pyr.pixels[l] : pyr.pixels[l + 1]] = l
    return out
