"""Multi-chip scaling: sharded global DWT with halo exchange + tile modes.

The reference is strictly single-threaded; scaling an image codec across a
TPU slice is this framework's own design (SURVEY §2.1 mapping table):

* **Row-sharded global transform** (`halo_dwt2d_fwd`): the full-image DWT,
  bit-exact vs the single-chip transform, computed with the image sharded
  over mesh rows.  Key idea: keep every level in *interleaved (in-place)
  layout* — the active samples of level t live on the dyadic grid (row ≡ 0
  mod 2^t), which stays evenly distributed across a row-sharded mesh, so no
  per-level redistribution is needed.  Each level's column lifting
  exchanges exactly one boundary row per direction per lifting step via
  ``lax.ppermute`` (the codec analog of context-parallel ring exchange).
  Once the stride no longer tiles the per-device block evenly, the
  remaining active grid is tiny; it is ``all_gather``-ed and finished
  redundantly on every device (replicated coarse tail).

* **Tile-parallel encode** (dwt_tpu/codec/tiled.py): independent per-tile
  streams — data-parallelism over tiles; the container format carries a
  per-tile length table and any prefix of any tile remains decodable.

* **Global truncation allocation** (`allocate_budget`): the byte-budget
  analog of the reference's CAPACITY mechanism across many tiles — rank
  (tile, layer) stream segments by the shared progressive schedule and cut
  all tiles at the deepest globally-affordable layer (all_gather of
  per-tile per-layer byte counts; prefix-sum; waterline search).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import Pyramid, compute_pyramid
from ..ops.lifting import dwt2d_fwd


def _tdiv(a, d):
    return jax.lax.div(a, jnp.asarray(d, a.dtype))


def _shard_map(f, **kw):
    """shard_map with the replication checker disabled (collectives like
    all_gather produce replicated outputs the VMA inference cannot always
    prove), across jax versions."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    for flag in ("check_vma", "check_rep"):
        try:
            return shard_map(f, **kw, **{flag: False})
        except TypeError:
            continue
    return shard_map(f, **kw)


def _lift_fwd_strided(x, axis: int, stride: int, n_active: int):
    """In-place (interleaved) forward lifting along `axis` on the dyadic
    grid with `stride`; positions i*stride for i < n_active participate.

    Equivalent to cdf53_fwd on the gathered active samples, but leaves
    results at their original (interleaved) positions: evens keep their
    spots, odds hold the high-pass values.  Bit-exact per SURVEY §2.3.
    """
    xm = jnp.moveaxis(x, axis, 0)
    ev = xm[:: 2 * stride]
    od = xm[stride :: 2 * stride]
    N = n_active
    ne, no = ev.shape[0], od.shape[0]
    right = ev[1:] if ne > no else jnp.concatenate([ev[1:], ev[-1:]], axis=0)
    d = od - _tdiv(ev[:no] + right, 2)
    left = jnp.concatenate([d[:1], d[:-1]], axis=0)
    upd = _tdiv(left + d, 4)
    nupd = ne if N % 2 == 0 else ne - 1
    s = jnp.concatenate([ev[:nupd] + upd[:nupd], ev[nupd:]], axis=0)
    xm = xm.at[:: 2 * stride].set(s)
    xm = xm.at[stride :: 2 * stride].set(d)
    return jnp.moveaxis(xm, 0, axis)


def _lift_inv_strided(x, axis: int, stride: int, n_active: int):
    """Inverse of :func:`_lift_fwd_strided`: un-update evens, then
    un-predict odds, on the dyadic grid (cdf53.h:36-61 order/signs)."""
    xm = jnp.moveaxis(x, axis, 0)
    ev = xm[:: 2 * stride]
    od = xm[stride :: 2 * stride]
    N = n_active
    ne, no = ev.shape[0], od.shape[0]
    d = od
    left = jnp.concatenate([d[:1], d[:-1]], axis=0)
    upd = _tdiv(left + d, 4)
    nupd = ne if N % 2 == 0 else ne - 1
    s = jnp.concatenate([ev[:nupd] - upd[:nupd], ev[nupd:]], axis=0)
    right = s[1:] if ne > no else jnp.concatenate([s[1:], s[-1:]], axis=0)
    od2 = d + _tdiv(s[:no] + right, 2)
    xm = xm.at[:: 2 * stride].set(s)
    xm = xm.at[stride :: 2 * stride].set(od2)
    return jnp.moveaxis(xm, 0, axis)


def interleaved_to_pyramid_perm(pyr: Pyramid) -> np.ndarray:
    """Gather indices mapping the in-place (interleaved) transform layout
    to the standard deinterleaved pyramid layout, flat over (H, W).

    After L in-place levels, the level-t low band lives on the dyadic grid
    (row, col ≡ 0 mod 2^t).  The deinterleaved pyramid places the level-l
    image in the top-left (heights[l], widths[l]) corner.  Computed once on
    host per geometry and composed with the Hilbert linearization so the
    device-side cost stays a single gather.
    """
    H, W = pyr.height, pyr.width
    # src[r, c] = original flat index whose value belongs at pyramid (r, c).
    src = np.arange(H * W, dtype=np.int64).reshape(H, W)
    for l in range(pyr.levels, 0, -1):
        h, w = pyr.heights[l], pyr.widths[l]
        sub = src[:h, :w]
        # Deinterleave rows then cols of this level's region: evens first.
        sub = np.concatenate([sub[:, 0::2], sub[:, 1::2]], axis=1)
        sub = np.concatenate([sub[0::2], sub[1::2]], axis=0)
        src[:h, :w] = sub
    return src.reshape(-1).astype(np.int32)


@functools.lru_cache(maxsize=32)
def _halo_plan(pyr: Pyramid, n_dev: int):
    """(n_halo, H_pad): how many transform steps run with halo exchange,
    and the padded row count the sharded buffer must use.

    Transform step t (t = 0 .. levels-1) lifts the dyadic grid of stride
    2^t.  The halo path needs the per-device active row count R/2^t to be
    uniform and even, i.e. R divisible by 2^(t+1).  Arbitrary heights are
    supported by padding rows to a multiple of n_dev * 2^k (the pad rows
    carry garbage; boundary masks in the column pass apply the reference's
    odd/even-N edge rules at the TRUE image edge, so results stay
    bit-exact — the pyramid gather never reads pad rows).  k is capped so
    the pad overhead stays below ~25% of the finest level.
    """
    H = pyr.height
    best = (0, -(-H // n_dev) * n_dev)
    for k in range(pyr.levels, -1, -1):
        q = n_dev << k
        h_pad = -(-H // q) * q
        # Deepest k whose row padding stays below ~8% wall-time overhead
        # (every device processes h_pad/n_dev rows).  The replicated
        # coarse tail beyond level k is only ~1/4^k of the total work, so
        # trading tail depth for low padding wins.
        if h_pad - H <= max(H // 12, n_dev * 2 - 1):
            best = (k, h_pad)
            break
    return best


def pad_rows(x, pyr: Pyramid, n_dev: int):
    """Pad (H, W, C) to the halo plan's (H_pad, W, C).  Pad rows carry
    zeros; they never influence real outputs (see halo_dwt2d_fwd)."""
    _, h_pad = _halo_plan(pyr, n_dev)
    if x.shape[0] == h_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((h_pad - x.shape[0],) + x.shape[1:], x.dtype)], axis=0)


def halo_dwt2d_fwd(x, mesh: Mesh, pyr: Pyramid, axis_name: str = "y"):
    """Forward multi-level 2-D DWT of a row-sharded image.

    ``x``: (H_pad, W, C) int32 (see :func:`pad_rows`), sharded
    P(axis_name, None, None) over `mesh`.  Returns (fine, coarse):
    ``fine`` is the interleaved-layout sharded buffer holding all
    halo-level results; ``coarse`` is the replicated deinterleaved
    transform of the remaining levels' LL image.  Reassemble with
    :func:`assemble_pyramid`.

    Bit-exactness on arbitrary geometries: the active dyadic grid of
    level t (rows = 0 mod 2^t) has exactly heights[L-t] REAL rows, all
    inside the unpadded image; per-row masks apply the reference's edge
    rules (cdf53.h:12-23 — even-N last-odd clamp, odd-N last-even
    no-update) at the true boundary, so pad rows only ever receive
    garbage, never contribute to a real row.
    """
    n_dev = mesh.shape[axis_name]
    n_halo, h_pad = _halo_plan(pyr, n_dev)
    L = pyr.levels
    W = pyr.width
    assert x.shape[0] == h_pad, (x.shape, h_pad)
    Rb = h_pad // n_dev

    def shard_fn(xb):
        idx = jax.lax.axis_index(axis_name)
        out = xb
        for t in range(n_halo):
            s = 1 << t
            h_act, w_act = pyr.heights[L - t], pyr.widths[L - t]
            n_odd = h_act // 2
            n_even = h_act - n_odd
            n_upd = n_even if h_act % 2 == 0 else n_even - 1
            # Row pass: local, on active rows (incl. pad rows — harmless),
            # strided active columns.
            rows = out[::s]
            rows = _lift_fwd_strided(rows, 1, s, w_act)
            out = out.at[::s].set(rows)
            # Column pass with halo exchange on the active dyadic grid.
            # Per-device even/odd counts are uniform: Rb / 2^(t+1).
            ev = out[:: 2 * s, ::s]
            od = out[s :: 2 * s, ::s]
            ne = ev.shape[0]
            jg = idx * ne + jnp.arange(ne)  # global even/odd grid index
            # predict: right neighbor of odd j = even j+1; the last odd on
            # each device needs the NEXT device's first even.  True-edge
            # rule: odd j with j+1 >= n_even clamps to its own left even
            # (cdf53.h:15-17; only j = n_odd-1 when h_act is even).
            recv_next = jax.lax.ppermute(
                ev[:1], axis_name,
                [(i + 1, i) for i in range(n_dev - 1)])
            right = jnp.concatenate([ev[1:], recv_next], axis=0)
            right = jnp.where((jg + 1 >= n_even)[:, None, None], ev, right)
            d = od - _tdiv(ev + right, 2)
            # update: left neighbor of even j = odd j-1; the first even
            # needs the PREVIOUS device's last odd (already predicted).
            # Global top edge (j = 0): clamp to own first odd
            # (cdf53.h:19-20 s0 rule).  Evens at/after n_upd keep their
            # value (odd-N last-even rule + pad rows).
            recv_prev = jax.lax.ppermute(
                d[-1:], axis_name,
                [(i, i + 1) for i in range(n_dev - 1)])
            left_head = jnp.where(idx == 0, d[:1], recv_prev)
            left = jnp.concatenate([left_head, d[:-1]], axis=0)
            sc = ev + _tdiv(left + d, 4)
            sc = jnp.where((jg < n_upd)[:, None, None], sc, ev)
            out = out.at[:: 2 * s, ::s].set(sc)
            out = out.at[s :: 2 * s, ::s].set(d)
        # Gather the coarse active grid and finish redundantly.
        S = 1 << n_halo
        coarse_loc = out[::S, ::S][:, : pyr.widths[L - n_halo]]
        coarse = jax.lax.all_gather(coarse_loc, axis_name, tiled=True)
        coarse = coarse[: pyr.heights[L - n_halo]]
        if n_halo < L:
            sub_pyr = compute_pyramid(pyr.widths[L - n_halo],
                                      pyr.heights[L - n_halo])
            coarse = dwt2d_fwd(coarse, sub_pyr)
        return out, coarse

    fn = _shard_map(
        shard_fn, mesh=mesh,
        in_specs=P(axis_name, None, None),
        out_specs=(P(axis_name, None, None), P(None, None, None)),
    )
    return fn(x)


def halo_perm(pyr: Pyramid, n_dev: int) -> np.ndarray:
    """Gather indices mapping the padded fine buffer (flattened
    (H_pad, W)) to the deinterleaved pyramid layout (flattened (H, W)) for
    the halo levels; coarse positions map to themselves (they are
    overwritten from the replicated coarse result before gathering).

    Row index r of the (H, W) grid lives at flat index r * W + c in BOTH
    layouts (pad rows only extend the buffer), so the permutation is the
    interleave->pyramid map of the halo levels only.
    """
    n_halo, _ = _halo_plan(pyr, n_dev)
    H, W, L = pyr.height, pyr.width, pyr.levels
    src = np.arange(H * W, dtype=np.int64).reshape(H, W)
    for l in range(L, L - n_halo, -1):
        h, w = pyr.heights[l], pyr.widths[l]
        sub = src[:h, :w]
        sub = np.concatenate([sub[:, 0::2], sub[:, 1::2]], axis=1)
        sub = np.concatenate([sub[0::2], sub[1::2]], axis=0)
        src[:h, :w] = sub
    return src.reshape(-1).astype(np.int64)


def assemble_pyramid(fine, coarse, pyr: Pyramid, n_dev: int):
    """Recombine halo-level (interleaved, sharded, row-padded) and coarse
    (pyramid, replicated) results into the standard deinterleaved pyramid
    layout (H, W, C).

    Host/test helper — the production encode path composes this mapping
    into the linearization gather instead of materializing it.
    """
    n_halo, _ = _halo_plan(pyr, n_dev)
    L = pyr.levels
    H, W = pyr.height, pyr.width
    out = np.asarray(fine).copy()
    S = 1 << n_halo
    hc, wc = pyr.heights[L - n_halo], pyr.widths[L - n_halo]
    # Place the coarse pyramid back onto the dyadic grid positions.
    out[::S, ::S][:hc, :wc] = np.asarray(coarse)
    flat = out.reshape(out.shape[0] * W, -1)
    return flat[halo_perm(pyr, n_dev)].reshape((H, W) + out.shape[2:])


def halo_dwt2d_inv(fine, mesh: Mesh, pyr: Pyramid, axis_name: str = "y"):
    """Inverse multi-level 2-D DWT of a row-sharded coefficient buffer.

    ``fine``: (H_pad, W, C) int32 in the interleaved halo layout with ALL
    coefficients placed (the coarse tail already inverse-transformed and
    scattered onto its dyadic grid — see parallel.encode.ShardedDecoder).
    Mirrors :func:`halo_dwt2d_fwd` exactly: per level, coarsest first,
    inverse column lifting with ppermute halos (un-update needs the
    previous device's last odd; un-predict the next device's first
    un-updated even), then local inverse row lifting (decode.c:16-30
    order).  Returns the sharded spatial image buffer (rows >= H are pad
    garbage).
    """
    n_dev = mesh.shape[axis_name]
    n_halo, h_pad = _halo_plan(pyr, n_dev)
    L = pyr.levels
    assert fine.shape[0] == h_pad, (fine.shape, h_pad)

    def shard_fn(xb):
        idx = jax.lax.axis_index(axis_name)
        out = xb
        for t in range(n_halo - 1, -1, -1):
            s = 1 << t
            h_act, w_act = pyr.heights[L - t], pyr.widths[L - t]
            n_odd = h_act // 2
            n_even = h_act - n_odd
            n_upd = n_even if h_act % 2 == 0 else n_even - 1
            ev = out[:: 2 * s, ::s]
            od = out[s :: 2 * s, ::s]
            ne = ev.shape[0]
            jg = idx * ne + jnp.arange(ne)
            d = od
            # un-update (reverse of the forward update, same neighbors)
            recv_prev = jax.lax.ppermute(
                d[-1:], axis_name,
                [(i, i + 1) for i in range(n_dev - 1)])
            left_head = jnp.where(idx == 0, d[:1], recv_prev)
            left = jnp.concatenate([left_head, d[:-1]], axis=0)
            sc = ev - _tdiv(left + d, 4)
            sc = jnp.where((jg < n_upd)[:, None, None], sc, ev)
            # un-predict with the un-updated evens
            recv_next = jax.lax.ppermute(
                sc[:1], axis_name,
                [(i + 1, i) for i in range(n_dev - 1)])
            right = jnp.concatenate([sc[1:], recv_next], axis=0)
            right = jnp.where((jg + 1 >= n_even)[:, None, None], sc, right)
            od2 = d + _tdiv(sc + right, 2)
            out = out.at[:: 2 * s, ::s].set(sc)
            out = out.at[s :: 2 * s, ::s].set(od2)
            # inverse row pass (local), after the column pass
            rows = out[::s]
            rows = _lift_inv_strided(rows, 1, s, w_act)
            out = out.at[::s].set(rows)
        return out

    fn = _shard_map(
        shard_fn, mesh=mesh,
        in_specs=P(axis_name, None, None),
        out_specs=P(axis_name, None, None),
    )
    return fn(fine)


# ---------------------------------------------------------------------------
# Global truncation allocation across tiles
# ---------------------------------------------------------------------------

def allocate_budget(layer_bytes, budget: int):
    """Cut a fleet of tile streams to a global byte budget.

    ``layer_bytes``: (n_tiles, n_layers) int32 — bytes each tile adds at
    each quality layer of the shared progressive schedule (layer 0 =
    header+root).  Returns (n_tiles,) byte lengths: every tile keeps its
    stream prefix through the deepest layer k such that the total over all
    tiles of layers <= k fits the budget, then the remainder is handed out
    layer-greedily tile-by-tile (matching the reference's behavior of
    truncating mid-layer, bytes.h:75-78, but coordinated globally).
    """
    per_layer = jnp.sum(layer_bytes, axis=0)          # (n_layers,)
    cum = jnp.cumsum(per_layer)
    k = jnp.sum((cum <= budget).astype(jnp.int32))    # full layers afforded
    nl = layer_bytes.shape[1]
    taken = jnp.where(jnp.arange(nl) < k, layer_bytes, 0).sum(axis=1)
    # distribute the remainder within layer k in tile order
    rem = budget - jnp.where(k > 0, cum[jnp.maximum(k - 1, 0)], 0)
    rem = jnp.maximum(rem, 0)
    nxt = jnp.where(jnp.arange(nl)[None, :] == k, layer_bytes, 0).sum(axis=1)
    pfx = jnp.cumsum(nxt) - nxt
    extra = jnp.clip(rem - pfx, 0, nxt)
    return (taken + extra).astype(jnp.int32)
