"""Integer CDF 5/3 lifting as whole-axis vectorized JAX ops.

TPU-first design: the reference runs a scalar 1-D kernel per row and one
interleaved-column call per level (encode.c:16-30, cdf53.h).  Here each
lifting step is a full-tensor slice arithmetic op over *all* rows/columns
of a level at once — exactly the layout the VPU wants, with XLA fusing the
predict/update/concat chain into a single HBM pass per direction.

Bit-exactness contract (SURVEY §2.3): all divisions are C truncation toward
zero (``lax.div``), never Python floor; odd-length boundary rules follow
cdf53.h:11-33 (clamped neighbors, no update on the last even sample of
odd-N signals); levels use ceil-halving geometry from `compute_pyramid`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import Pyramid


def _tdiv(a, d: int):
    """C-semantics truncating division by positive constant d."""
    return jax.lax.div(a, jnp.asarray(d, a.dtype))


def cdf53_fwd(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Forward reversible CDF 5/3 along `axis`; output deinterleaved [L | H].

    Works for any N >= 2 (even or odd), any leading/trailing batch dims.
    All steps slice/concat along `axis` directly — no moveaxis: a
    materialized transpose per direction per level is far costlier on TPU
    than the strided lane/sublane slices.
    """
    N = x.shape[axis]

    def sl(a, i, j, stride=1):
        return jax.lax.slice_in_dim(a, i, j, stride, axis)

    def cat(*parts):
        return jnp.concatenate(parts, axis=axis)

    ev, od = sl(x, 0, N, 2), sl(x, 1, N, 2)
    ne, no = ev.shape[axis], od.shape[axis]
    # Predict: d[i] = od[i] - (ev[i] + ev[i+1]) / 2, right neighbor clamped
    # to ev[-1] when N is even (cdf53.h:15-17 reduces to exactly this).
    right = sl(ev, 1, ne) if ne > no else cat(sl(ev, 1, ne),
                                              sl(ev, ne - 1, ne))
    d = od - _tdiv(sl(ev, 0, no) + right, 2)
    # Update: s[i] = ev[i] + (d[i-1] + d[i]) / 4, left clamped to d[0]
    # (cdf53.h:19-20: s0 += d0/2 == (d0+d0)/4 in truncating arithmetic).
    # Last even sample of odd-N signals gets no update (loop bound M).
    left = cat(sl(d, 0, 1), sl(d, 0, no - 1))
    upd = _tdiv(left + d, 4)
    nupd = ne if N % 2 == 0 else ne - 1
    s = cat(sl(ev, 0, nupd) + sl(upd, 0, nupd), sl(ev, nupd, ne))
    return cat(s, d)


def cdf53_inv(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inverse lifting: undo update, undo predict, re-interleave (cdf53.h:36-61)."""
    N = x.shape[axis]

    def sl(a, i, j, stride=1):
        return jax.lax.slice_in_dim(a, i, j, stride, axis)

    def cat(*parts):
        return jnp.concatenate(parts, axis=axis)

    ne = (N + 1) // 2
    s, d = sl(x, 0, ne), sl(x, ne, N)
    no = d.shape[axis]
    left = cat(sl(d, 0, 1), sl(d, 0, no - 1))
    upd = _tdiv(left + d, 4)
    nupd = ne if N % 2 == 0 else ne - 1
    ev = cat(sl(s, 0, nupd) - sl(upd, 0, nupd), sl(s, nupd, ne))
    right = sl(ev, 1, ne) if ne > no else cat(sl(ev, 1, ne),
                                              sl(ev, ne - 1, ne))
    od = d + _tdiv(sl(ev, 0, no) + right, 2)
    # Re-interleave evens/odds: stack on a fresh minor axis next to `axis`
    # and merge — a reshape, not a scatter.
    if ne > no:  # odd N: pad the odd stream by one (dropped after merge)
        odp = cat(od, sl(od, no - 1, no))
    else:
        odp = od
    ax = axis % x.ndim
    inter = jnp.stack([ev, odp], axis=ax + 1)
    shape = list(x.shape)
    shape[ax] = 2 * ne
    inter = inter.reshape(shape)
    return sl(inter, 0, N)


def dwt2d_fwd(img: jnp.ndarray, pyr: Pyramid) -> jnp.ndarray:
    """Multi-level forward 2-D DWT on (H, W, C) int32 (mirrors encode.c:16-30).

    Rows first then all columns at once per level; the LL quadrant recurses.
    Level loop is a static Python loop — every intermediate shape is static,
    so XLA sees one straight-line fused program.
    """
    out = img
    for l in range(pyr.levels, 0, -1):
        w, h = pyr.widths[l], pyr.heights[l]
        sub = out[:h, :w]
        sub = cdf53_fwd(sub, axis=1)
        sub = cdf53_fwd(sub, axis=0)
        out = out.at[:h, :w].set(sub) if (h, w) != out.shape[:2] else sub
    return out


def dwt2d_inv(coeff: jnp.ndarray, pyr: Pyramid, levels: int | None = None) -> jnp.ndarray:
    """Inverse multi-level 2-D DWT (mirrors decode.c:16-30): coarsest first."""
    out = coeff
    levels = pyr.levels if levels is None else levels
    for l in range(1, levels + 1):
        w, h = pyr.widths[l], pyr.heights[l]
        sub = out[:h, :w]
        sub = cdf53_inv(sub, axis=0)
        sub = cdf53_inv(sub, axis=1)
        out = out.at[:h, :w].set(sub) if (h, w) != out.shape[:2] else sub
    return out
