"""Fully parallel TPU entropy encoder for the .dwt bitstream.

The reference encoder is a bit-serial chain: bitplane loops feed a zero-run
coder, runs feed an adaptive VLI coder whose single ``order`` state threads
through the entire stream, and bits drip one at a time into bytes
(encode.c:60-110, rle.h, vli.h, bits.h).  None of that survives contact
with a TPU.  This module re-derives the identical bytes as a data-parallel
pipeline (SURVEY §7 "key architectural insight"):

1. **Token ranks, not state machines.**  At plane p a coefficient with
   significance plane q (MSB index of |coeff|) is: a zero-run member when
   q < p, newly significant (run-flush token + sign bit) when q == p, and a
   refinement bit when q > p.  Every emitted token's *global position* in
   the stream is therefore a pure function of magnitudes — computed with
   per-chunk histograms, level-segmented prefix sums over the whole
   linearized detail axis (channel-major so the coefficient axis rides the
   128-wide vector lanes), and one tiny carry chain over the (channel,
   level, plane) schedule grid.  Tokens scatter-write into a dense
   rank-indexed buffer; no sequential coding state exists.

2. **Adaptive VLI order as an associative scan.**  The per-stream ``order``
   state (vli.h:67-84) is a chain over ~31 values.  Tokens are processed in
   blocks: each block's state-transition map is built by a vectorized scan
   over all possible entry states, block maps compose with
   ``jax.lax.associative_scan`` (gather = function composition), and one
   replay pass recovers the exact order at every token.

3. **Bit packing as prefix-sum + scatter-add.**  Per-token bit lengths
   prefix-sum into bit offsets; each token's LSB-first codeword splits into
   <=3 u32 word contributions; disjoint-bit scatter-adds assemble the final
   stream words.

Byte-budget truncation (bytes.h:75-78) is a host-side slice: the reference's
capacity mechanism emits exactly the prefix of the unconstrained stream.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import Pyramid, compute_pyramid
from ..hilbert import padded_layout
from ..ops.color import rgb_to_ycocg
from ..ops.lifting import dwt2d_fwd

# Adaptive VLI order never exceeds ~log2(max run) + 2; 31 states cover every
# stream with run lengths < 2^28 (images up to ~16K x 16K per stream).
NSTATE = 31
# Bitplane count bound == the format's own ceiling: magnitudes must stay
# below 2^29 because bits 29/30 are the sig/ref coding flags
# (encode.c:115-128), so no valid stream has more than 29 planes.  Images
# whose transform exceeds that magnitude are rejected (encode_with_stats),
# never silently truncated.
PMAX = 29
# Token-block length of the VLI order-state scan: nblk = padded_T/BLOCK
# lanes ride each of the BLOCK sequential scan steps.  Element work is
# layout-invariant; bigger blocks shrink the compose pass and amortize
# per-iteration overhead (with unroll) — measured at 4K on v5e:
# 256/u1 18.4 ms, 256/u8 13.7, 512/u8 11.6, 1024/u8 10.0, 2048/u8 9.5.
# 1024 keeps programs small and divides every padded_T the token buckets
# emit (multiples of pallas_pack.BLOCKN = 2048).
BLOCK = int(os.environ.get("DWT_VLI_BLOCK", "1024"))
_VLI_UNROLL = int(os.environ.get("DWT_VLI_UNROLL", "8"))
LMAX = 64  # static bound on progressive quality layers (2*max(levels,planes)-1)


def _ilog2_i32(x):
    """Floor log2 for x>0 (int32); garbage for x<=0 — mask at call sites."""
    return 31 - jax.lax.clz(x.astype(jnp.int32))


def _excl_cumsum(x, axis=-1):
    return jnp.cumsum(x, axis=axis) - x


def _vli_k(v, s):
    """Number of prefix zeros put_vli emits for value v at order s.

    k = max(0, ilog2(v + 2^s) - s)  (derived from vli.h:73-78: after k
    iterations the remaining value is v - (2^(s+k) - 2^s)).  int32-safe for
    v < 2^28, s < 31.
    """
    u = v.astype(jnp.int32) + (jnp.int32(1) << s.astype(jnp.int32))
    return jnp.maximum(_ilog2_i32(u) - s.astype(jnp.int32), 0)


def _vli_next_state(v, s, is_vli):
    k = _vli_k(v, s)
    ns = jnp.minimum(jnp.maximum(s + k - 2, 0), NSTATE - 1)
    return jnp.where(is_vli, ns, s).astype(s.dtype)


ALIGN = 8192  # lane alignment of scan-order segments (hilbert.padded_layout).
# 8 x the compaction kernels' SUBA row width: every unit's element start
# maps to a whole 8-row sublane tile of the 2-D packed-element array, which
# Mosaic requires for dynamic sublane (dim-0) slicing of int32 memrefs.


class _Segs:
    """Static lane-aligned level-chunk segmentation of the detail axis.

    All segment starts/sizes are multiples of ALIGN, so every slice,
    concat-broadcast and reduction below operates on aligned lane spans —
    unaligned lane offsets are a ~100x throughput cliff on TPU.
    Pad elements (valid == False) never enter any mask.
    """

    def __init__(self, pyr: Pyramid):
        from ..hilbert import padded_layout
        from ..ops.pallas_compact import E

        _, valid, sizes_p = padded_layout(pyr, ALIGN)
        self.L = pyr.levels
        self.root_pad = sizes_p[0]
        self.sizes = sizes_p[1:]  # padded detail segment sizes
        self.real = tuple(pyr.pixels[l + 1] - pyr.pixels[l] for l in range(self.L))
        starts = []
        o = 0
        for s in self.sizes:
            starts.append(o)
            o += s
        self.starts = tuple(starts)
        self.n = o
        self.valid_np = valid[self.root_pad:]
        self.idx_local = jnp.asarray(
            np.concatenate([np.arange(s, dtype=np.int32) for s in self.sizes]))

        # Static E-element chunk table (units of the Pallas compaction
        # kernels; also the granularity of stage 1's per-chunk histograms).
        # Chunks never cross segment boundaries; lengths are 512-multiples.
        ch_start, ch_len, ch_level = [], [], []
        lv_base, lv_cnt = [], []
        for l, (st, sz) in enumerate(zip(self.starts, self.sizes)):
            lv_base.append(len(ch_start))
            o = 0
            while o < sz:
                ln = min(E, sz - o)
                ch_start.append(st + o)
                ch_len.append(ln)
                ch_level.append(l)
                o += ln
            lv_cnt.append(len(ch_start) - lv_base[-1])
        self.nchunk = len(ch_start)
        self.ch_start = tuple(ch_start)
        self.ch_len = tuple(ch_len)
        self.ch_level = tuple(ch_level)
        self.level_chunk_base = tuple(lv_base)
        self.level_nchunk = tuple(lv_cnt)
        self.ch_valid = tuple(
            int(self.valid_np[s : s + ln].sum())
            for s, ln in zip(ch_start, ch_len))
        # 512-block -> chunk id (for stage-1 hierarchical chunk sums).
        self.block_chunk = np.repeat(
            np.arange(self.nchunk, dtype=np.int32),
            [ln // 512 for ln in ch_len])

    def valid(self):
        return jnp.asarray(self.valid_np)

    def bcast(self, small):
        """(C, L) per-segment values -> (C, n) per-element, via static concat."""
        return jnp.concatenate(
            [jnp.broadcast_to(small[:, l : l + 1], (small.shape[0], self.sizes[l]))
             for l in range(self.L)], axis=1)

    def reduce_sum(self, x):
        """(C, n) -> (C, L) per-segment int32 sums via static aligned slices."""
        return jnp.stack(
            [x[:, self.starts[l] : self.starts[l] + self.sizes[l]].sum(
                axis=1, dtype=jnp.int32)
             for l in range(self.L)], axis=1)

    def reduce_max(self, x):
        return jnp.stack(
            [x[:, self.starts[l] : self.starts[l] + self.sizes[l]].max(axis=1)
             for l in range(self.L)], axis=1)

    def excl_cumsum(self, x):
        """Segment-wise exclusive cumsum along the element axis."""
        c = _excl_cumsum(x, axis=-1)
        bases = jnp.stack([c[:, self.starts[l]] for l in range(self.L)], axis=1)
        return c - self.bcast(bases)

    def chunk_sum(self, mask):
        """(C, n) bool -> (C, nchunk) int32 per-chunk counts, via 512-block
        partial sums + a static sorted scatter-add."""
        b512 = mask.reshape(mask.shape[0], -1, 512).sum(-1, dtype=jnp.int32)
        ids = jnp.asarray(self.block_chunk)
        return jnp.zeros((mask.shape[0], self.nchunk), jnp.int32).at[
            :, ids].add(b512, indices_are_sorted=True)

    def level_sum(self, x_ck):
        """(C, nchunk) -> (C, L) by summing each level's chunk span."""
        return jnp.stack(
            [x_ck[:, b : b + c].sum(axis=1, dtype=jnp.int32)
             for b, c in zip(self.level_chunk_base, self.level_nchunk)],
            axis=1)

    def level_excl_cumsum(self, x_ck, axis=1):
        """Exclusive cumsum over the chunk axis, restarting per level.
        Works on (C, nchunk) or (C, nchunk, P)."""
        parts = []
        for b, c in zip(self.level_chunk_base, self.level_nchunk):
            sl = x_ck[:, b : b + c]
            parts.append(jnp.cumsum(sl, axis=1) - sl)
        return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# Stage 1: transform + statistics (token counts, schedule, carry chain)
# ---------------------------------------------------------------------------

def _plane_stats(q, valid, segs: _Segs, C: int, L: int, planes_max):
    """(C, L, PMAX) / (C, nchunk, PMAX) per-plane token statistics in three
    fused one-hot reduction passes over the coefficient axis (the round-1
    rolled loop paid ~5 passes x planes_max): per-512-block plane
    histograms, last-significant positions, and boundary-prefix zero
    counts.  trailZ(c,l,p) — zeros after the level's last newly-significant
    element (rle.h run threading) — decomposes exactly because level-local
    indices are monotone across a level's chunks: the level's lastS lives
    in exactly one chunk k*, so z_upto = sum_{k<k*} nZ_ck[k] + (chunk-local
    zeros at idx <= lastS), all chunk-local one-hot reductions.  Values at
    p >= planes_max differ from the loop's zeros only in slots every
    consumer masks by step validity.  DWT_STATS_LOOP=1 restores the loop.
    """
    if os.environ.get("DWT_STATS_LOOP") == "1":
        return _plane_stats_loop(q, valid, segs, C, L, planes_max)
    nb = q.shape[1] // 512
    qb = q.reshape(C, nb, 512)
    validb = jnp.asarray(segs.valid_np).reshape(1, nb, 512)
    idxb = segs.idx_local.reshape(1, nb, 512)
    p_all = jnp.arange(PMAX, dtype=jnp.int32)
    ids = jnp.asarray(segs.block_chunk)

    z0_b = jnp.sum((qb == -1) & validb, axis=2, dtype=jnp.int32)  # (C, nb)
    hist_p, last_p = [], []
    GP = 8  # planes per fused pass: bounds any materialized temporary
    for g0 in range(0, PMAX, GP):
        pg = p_all[g0 : g0 + GP]
        oh = qb[..., None] == pg
        hist_p.append(jnp.sum(oh, axis=2, dtype=jnp.int32))
        last_p.append(jnp.max(jnp.where(oh, idxb[..., None], -1), axis=2))
    hist_b = jnp.concatenate(hist_p, axis=-1)   # (C, nb, PMAX)
    lastS_b = jnp.concatenate(last_p, axis=-1)

    zero_ckp = jnp.zeros((C, segs.nchunk, PMAX), jnp.int32)
    nS_ck = zero_ckp.at[:, ids].add(hist_b, indices_are_sorted=True)
    lastS_ck = jnp.full((C, segs.nchunk, PMAX), -1, jnp.int32).at[
        :, ids].max(lastS_b, indices_are_sorted=True)
    z0_ck = jnp.zeros((C, segs.nchunk), jnp.int32).at[:, ids].add(
        z0_b, indices_are_sorted=True)
    nZ_ck = z0_ck[..., None] + (jnp.cumsum(nS_ck, axis=2) - nS_ck)

    # Chunk-local boundary-prefix zeros: zeros at idx <= the chunk's own
    # last-significant position, per plane.
    lastS_bc = jnp.take(lastS_ck, ids, axis=1)  # (C, nb, PMAX)
    qzb = jnp.where(validb, qb, jnp.int32(2**30))
    zup_p = []
    for g0 in range(0, PMAX, GP):
        pg = p_all[g0 : g0 + GP]
        m = ((qzb[..., None] < pg)
             & (idxb[..., None] <= lastS_bc[:, :, None, g0 : g0 + GP]))
        zup_p.append(jnp.sum(m, axis=2, dtype=jnp.int32))
    zup_ck = zero_ckp.at[:, ids].add(
        jnp.concatenate(zup_p, axis=-1), indices_are_sorted=True)

    def lvl(x, red):
        return jnp.stack(
            [red(x[:, b : b + c]) for b, c in
             zip(segs.level_chunk_base, segs.level_nchunk)], axis=1)

    nS = lvl(nS_ck, lambda s: s.sum(axis=1, dtype=jnp.int32))
    nZ = lvl(nZ_ck, lambda s: s.sum(axis=1, dtype=jnp.int32))
    lastS = lvl(lastS_ck, lambda s: s.max(axis=1))          # (C, L, PMAX)
    lastS_cc = jnp.concatenate(
        [jnp.broadcast_to(lastS[:, l : l + 1],
                          (C, segs.level_nchunk[l], PMAX))
         for l in range(L)], axis=1)                        # (C, nchunk, PMAX)
    zcar = segs.level_excl_cumsum(nZ_ck)
    is_k = (lastS_ck == lastS_cc) & (lastS_ck >= 0)
    z_upto = lvl(jnp.where(is_k, zcar + zup_ck, 0),
                 lambda s: s.sum(axis=1, dtype=jnp.int32))
    return nS, nZ, nZ - z_upto, nS_ck, nZ_ck


def _plane_stats_loop(q, valid, segs: _Segs, C: int, L: int, planes_max):
    """Rolled per-plane fallback (the round-1 formulation): one plane's
    temporaries live at a time, traced upper bound skips planes beyond the
    image's maximum."""
    idx = jnp.broadcast_to(segs.idx_local[None, :], q.shape)

    def stat_body(p, acc):
        nS, nZ, trailZ, nS_ck, nZ_ck = acc
        maskS = (q == p) & valid
        maskZ = (q < p) & valid
        s_ck = segs.chunk_sum(maskS)
        z_ck = segs.chunk_sum(maskZ)
        s_cnt = segs.level_sum(s_ck)
        z_cnt = segs.level_sum(z_ck)
        lastS = segs.reduce_max(jnp.where(maskS, idx, -1))
        z_upto = segs.reduce_sum(
            (maskZ & (idx <= segs.bcast(lastS))).astype(jnp.int32))
        return (nS.at[:, :, p].set(s_cnt), nZ.at[:, :, p].set(z_cnt),
                trailZ.at[:, :, p].set(z_cnt - z_upto),
                nS_ck.at[:, :, p].set(s_ck), nZ_ck.at[:, :, p].set(z_ck))

    zero_clp = jnp.zeros((C, L, PMAX), jnp.int32)
    zero_ckp = jnp.zeros((C, segs.nchunk, PMAX), jnp.int32)
    return jax.lax.fori_loop(
        0, jnp.minimum(planes_max, PMAX), stat_body,
        (zero_clp, zero_clp, zero_clp, zero_ckp, zero_ckp))


def _transform_and_stats(img, pyr: Pyramid, channels: int, gray: bool, perm,
                         engine: bool | None = None):
    data = img.astype(jnp.int32)
    if not gray:
        data = rgb_to_ycocg(data)
    coeff = dwt2d_fwd(data, pyr)
    return _stats_from_lin(_linearize(coeff, perm, pyr, channels, engine),
                           pyr, channels)


def _linearize(coeff, perm, pyr: Pyramid, channels: int,
               engine: bool | None = None):
    """(H, W, C) coefficients -> (C, padded) scan-order layout.

    On TPU the static permutation runs as the Pallas tile engine
    (ops/pallas_hilbert.py: constant one-hot MXU matmuls per 32x32 tile —
    XLA's gather costs ~8 ns/index regardless of locality); the root band
    is a dense raster crop.  Elsewhere: one XLA gather over the padded
    perm.  ``engine=False`` forces the XLA path — REQUIRED under vmap
    (batched encode): pallas_call blocks in ANY memory space cannot take a
    leading batch dimension."""
    if engine is None:
        engine = _use_engine()
    if engine and min(pyr.height, pyr.width) >= 32:
        from ..hilbert import tile_plan
        from ..ops.pallas_hilbert import hilbert_gather_pallas

        plan = tile_plan(pyr, ALIGN)
        lin = hilbert_gather_pallas(coeff, plan, perm.shape[0], channels)
        h0, w0 = pyr.heights[0], pyr.widths[0]
        root = coeff[:h0, :w0, :].reshape(h0 * w0, channels).T
        return jax.lax.dynamic_update_slice(lin, root, (0, 0))
    return coeff.reshape(pyr.total, channels)[perm].T


def _stats_from_lin(lin, pyr: Pyramid, channels: int):
    """Stage-1 statistics from an already-linearized coefficient array —
    the entry point for the sharded (halo-transform) encode path, which
    produces ``lin`` with a device-side composed gather instead of the
    local transform above (dwt_tpu/parallel/encode.py)."""
    pix0 = pyr.pixels[0]
    L, C = pyr.levels, channels
    segs = _Segs(pyr)

    root = lin[:, :pix0]
    det = lin[:, segs.root_pad :]
    valid = segs.valid()[None, :]
    mag = jnp.abs(det)
    q = jnp.where((mag > 0) & valid, _ilog2_i32(mag), -1)  # (C, n)
    q = jnp.where(valid, q, -1)

    planes = 1 + jnp.max(jnp.where(valid, q, -1), axis=1)  # (C,)
    planes_max = jnp.max(planes)

    nS, nZ, trailZ, nS_ck, nZ_ck = _plane_stats(q, valid, segs, C, L,
                                                planes_max)
    nums = jnp.asarray(segs.real, jnp.int32)
    nRef = jnp.where(
        jnp.arange(PMAX)[None, None, :] < planes_max,
        nums[None, :, None] - nZ - nS, 0)

    # --- schedule order over the (C, L, PMAX) step grid -------------------
    c_ix = jnp.arange(C, dtype=jnp.int32)[:, None, None]
    l_ix = jnp.arange(L, dtype=jnp.int32)[None, :, None]
    p_ix = jnp.arange(PMAX, dtype=jnp.int32)[None, None, :]
    sec = (c_ix > 0).astype(jnp.int32)
    layers = jnp.where(sec == 0, planes_max - 2 - p_ix + l_ix,
                       planes_max - 1 - p_ix + l_ix)
    valid = jnp.broadcast_to(p_ix < planes[:, None, None], (C, L, PMAX))
    key = ((layers + 1) << 16) | (sec << 12) | (l_ix << 6) | c_ix
    key = jnp.where(valid, key, jnp.int32(2**30)).reshape(-1)
    order = jnp.argsort(key, stable=True)  # schedule order of flat steps

    nS_s = nS.reshape(-1)[order]
    nZ_s = nZ.reshape(-1)[order]
    trailZ_s = trailZ.reshape(-1)[order]
    nRef_s = nRef.reshape(-1)[order]
    valid_s = valid.reshape(-1)[order]

    # --- zero-run carry chain over schedule steps (rle.h cnt threading) ---
    # When planes_max == 0 the degenerate pre-step (plane index -1,
    # encode.c:190-194) contributes chunk-0's positions as pure zeros.
    carry0 = jnp.where(planes_max == 0, jnp.int32(segs.real[0]), 0)

    def step(carry, xs):
        v, s_cnt, z_cnt, t_z, r_cnt = xs
        refrun_val = jnp.where(s_cnt > 0, t_z, carry + z_cnt)
        refrun_ok = v & (r_cnt > 0) & (refrun_val > 0)
        out = jnp.where(r_cnt > 0, 0,
                        jnp.where(s_cnt > 0, t_z, carry + z_cnt))
        nxt = jnp.where(v, out, carry).astype(jnp.int32)
        return nxt, (carry, refrun_val.astype(jnp.int32), refrun_ok)

    carry_end, (carry_in_s, refrun_val_s, refrun_ok_s) = jax.lax.scan(
        step, carry0, (valid_s, nS_s, nZ_s, trailZ_s, nRef_s))

    # --- token counts / bases ---------------------------------------------
    root_max = jnp.max(jnp.abs(root), axis=1)
    root_cnt = jnp.where(root_max > 0,
                         1 + _ilog2_i32(jnp.maximum(root_max, 1)), 0)
    nnz_root = jnp.sum(root != 0, axis=1, dtype=jnp.int32)
    root_tokens = (1 + jnp.where(root_cnt > 0, pix0 + nnz_root, 0)).astype(jnp.int32)
    root_base = _excl_cumsum(root_tokens)
    planes_base = jnp.sum(root_tokens, dtype=jnp.int32)
    steps_base0 = planes_base + C

    # Compact token ranks: refinement bits are NOT tokens — they are raw
    # bits at closed-form positions (refstart(step) + rank-among-refined)
    # and are packed directly into stream words, so the token array (and
    # the VLI order scan over it) holds only runs/signs/roots/flush.
    #
    # On the Pallas path each step's base is padded up to a pack-kernel
    # block boundary (pad slots are 0-bit raw tokens — they emit nothing).
    # The refinement-bit offset injection of a step then always lands
    # exactly between pack blocks, so no block ever contains a large
    # word-index jump: within a step consecutive compact tokens average
    # well under the kernel's span budget (VLI <= 61 bits always paired
    # with a 1-bit sign; root tokens <= 30 bits), making every block
    # provably "tame" and the straggler scatter pass a dead path.  Costs
    # ~(steps * BLOCKN/2) pad tokens, a few percent of T at 4K.
    cnt_s = jnp.where(valid_s, 2 * nS_s + refrun_ok_s.astype(jnp.int32), 0)
    if _use_pallas():
        from ..ops.pallas_pack import BLOCKN as _BT

        cnt_al = (cnt_s + _BT - 1) // _BT * _BT
        steps_base0_al = (steps_base0 + _BT - 1) // _BT * _BT
    else:
        # Pair alignment (the extra slot is a 0-bit raw token emitting
        # nothing): the dense finisher classifies in pair space, which
        # needs every step base even.
        cnt_al = (cnt_s + 1) // 2 * 2
        steps_base0_al = (steps_base0 + 1) // 2 * 2
    base_s = (steps_base0_al + _excl_cumsum(cnt_al)).astype(jnp.int32)
    T = steps_base0_al + jnp.sum(cnt_al, dtype=jnp.int32) + 1  # +1 flush token
    # Offset-injection site per step: the next step's (block-aligned) base,
    # so this step's pad slots keep pre-injection offsets.
    inj_pos_s = jnp.concatenate([base_s[1:], (T - 1)[None]]).astype(jnp.int32)
    nref_v = jnp.where(valid_s, nRef_s, 0)
    refpfx_s = _excl_cumsum(nref_v).astype(jnp.int32)  # ref bits before step

    S = C * L * PMAX

    def unsort(x):
        return jnp.zeros(S, x.dtype).at[order].set(x).reshape(C, L, PMAX)

    stats = dict(
        planes=planes, planes_max=planes_max,
        nS=nS, nRef=nRef, root_cnt=root_cnt, root_base=root_base,
        planes_base=planes_base,
        step_base=unsort(base_s),
        step_end=unsort(base_s + cnt_s),
        inj_pos=unsort(inj_pos_s),
        refpfx=unsort(refpfx_s),
        carry_in=unsort(carry_in_s),
        refrun_val=unsort(refrun_val_s),
        refrun_ok=unsort(refrun_ok_s),
        valid=valid,
        carry_end=carry_end,
        T=T,
        order=order.astype(jnp.int32),
        nS_ck=nS_ck,
        nZ_ck=nZ_ck,
        # Schedule-ordered step views used by the dense token finisher and
        # the kernel metadata (all (S,) in schedule order).
        base_sched=base_s,
        nS_sched=jnp.where(valid_s, nS_s, 0),
        cin_sched=carry_in_s,
        valid_sched=valid_s,
    )
    return lin, stats


# ---------------------------------------------------------------------------
# Stage 2: token build + VLI order scan + bit packing
# ---------------------------------------------------------------------------

def _detail_q(lin, segs):
    """(C, n) significance plane per padded detail element (-1 = zero/pad)."""
    det = lin[:, segs.root_pad :]
    valid = segs.valid()[None, :]
    mag = jnp.abs(det)
    q = jnp.where((mag > 0) & valid, _ilog2_i32(mag), -1)
    return jnp.where(valid, q, -1), mag, det, valid


def _packed_elems(lin, segs):
    """((C*n + E) / SUBA, SUBA) int32 sign|mag element rows for the Pallas
    kernels: bits 0..29 = |coeff|, bit 30 = sign, -1 = padding/invalid.
    Row width SUBA == ALIGN / 8, so every unit starts on a whole 8-row
    sublane tile (required for the kernels' dynamic dim-0 slicing)."""
    from ..ops.pallas_compact import E, SUBA

    det = lin[:, segs.root_pad :]
    valid = segs.valid()[None, :]
    vm = jnp.where(valid, jnp.abs(det) | (det < 0).astype(jnp.int32) << 30,
                   -1).astype(jnp.int32)
    flat = jnp.concatenate(
        [vm.reshape(1, -1), jnp.full((1, E), -1, jnp.int32)], axis=1)
    return flat.reshape(-1, SUBA)


def _unit_common(stats, segs, pyr: Pyramid, channels: int):
    """Per-unit (schedule step x E-element chunk) indexing shared by both
    compaction kernels.  Unit order = schedule order of steps (stream
    order) x chunk order — the monotone-output precondition of the
    sequential-grid kernels.  All arrays are (U,) int32 device values;
    U = C * PMAX * nchunk is static."""
    L, C = pyr.levels, channels
    order = stats["order"]  # (S,) flat (c, l, p) ids in schedule order
    c_s = order // (L * PMAX)
    l_s = (order // PMAX) % L
    p_s = order % PMAX
    npl = jnp.asarray(segs.level_nchunk, jnp.int32)
    ups = npl[l_s]
    ubase = jnp.cumsum(ups) - ups
    U = C * PMAX * segs.nchunk
    u = jnp.arange(U, dtype=jnp.int32)
    sidx = (jnp.searchsorted(ubase, u, side="right") - 1).astype(jnp.int32)
    k = u - ubase[sidx]
    c_u, l_u, p_u = c_s[sidx], l_s[sidx], p_s[sidx]
    chunkid = jnp.asarray(segs.level_chunk_base, jnp.int32)[l_u] + k
    elem = (c_u * segs.n + jnp.asarray(segs.ch_start, jnp.int32)[chunkid])
    elen = jnp.asarray(segs.ch_len, jnp.int32)[chunkid]
    flat_step = order[sidx]
    flat_ck = (c_u * segs.nchunk + chunkid) * PMAX + p_u
    valid_u = stats["valid_sched"][sidx]
    return dict(elem=elem, elen=elen, p=p_u, flat_step=flat_step,
                flat_ck=flat_ck, valid=valid_u)


def _kernel_a_meta(stats, segs: _Segs, com, padded_T: int):
    """Per-unit metadata for compaction kernel A.  Returns (meta (U, 8)
    int32, pairbuf size).  Shared by _sig_tokens_pallas and the kernel
    probes (benchmarks/probe_kperf.py) so they can never desynchronize."""
    from ..ops import pallas_compact as pc

    scar = segs.level_excl_cumsum(stats["nS_ck"])
    zcar = segs.level_excl_cumsum(stats["nZ_ck"])
    nS_u = stats["nS_ck"].reshape(-1)[com["flat_ck"]]
    u_pair0 = (stats["step_base"].reshape(-1)[com["flat_step"]] >> 1) \
        + scar.reshape(-1)[com["flat_ck"]]
    npair = padded_T // 2
    pairbuf = npair + pc.WTOK_BIG + 256
    # The clip's hi bound must itself be 128-aligned: the kernel PROMISES
    # Mosaic a 128-aligned window start (pl.multiple_of), and a clamped
    # misaligned value would corrupt the window on hardware.
    ws = jnp.clip(u_pair0 & ~jnp.int32(127), 0,
                  (pairbuf - pc.WTOK_BIG) // 128 * 128)
    meta = jnp.stack([
        com["elem"] // pc.SUBA, com["elen"], com["p"], ws, u_pair0 - ws,
        zcar.reshape(-1)[com["flat_ck"]],
        jnp.where(com["valid"], nS_u, 0),
        jnp.zeros_like(nS_u),
    ], axis=1).astype(jnp.int32)
    return meta, pairbuf


def _sig_tokens_pallas(lin, stats, pyr: Pyramid, channels: int,
                       padded_T: int):
    """Kernel-A path: compact (zpfx, sign) pairs into the token buffer.

    The kernel works in pair space — one placed value ((zpfx << 1) | sign)
    per newly-significant element at consecutive pair ranks; step bases
    are even (pack-block aligned), so every pair rank is a token slot
    divided by two.  The interleaved token array is then derived densely
    here (stack + reshape, pure bandwidth)."""
    from ..ops import pallas_compact as pc

    segs = _Segs(pyr)
    com = _unit_common(stats, segs, pyr, channels)
    meta, pairbuf = _kernel_a_meta(stats, segs, com, padded_T)
    npair = padded_T // 2
    vmag = _packed_elems(lin, segs)
    pair0 = jnp.zeros((1, pairbuf), jnp.int32)
    pairs = pc.compact_tokens_pallas(vmag, meta, pair0)[0, :npair]
    return pairs >> 1, pairs & 1, vmag, com


def _sig_tokens_xla(lin, stats, pyr: Pyramid, channels: int, padded_T: int):
    """Fallback (CPU and DWT_NO_PALLAS): scatter the same zero-prefix and
    sign values at their PAIR ranks with XLA scatters.  Unlike the Pallas
    kernel's packed (zpfx << 1) | sign value, the two separate arrays keep
    zero-prefixes up to 2^31 valid (no 2^30 segment-size ceiling)."""
    C = channels
    segs = _Segs(pyr)
    npair = padded_T // 2
    DUMP = npair
    q, _, det, valid = _detail_q(lin, segs)
    sgn = (det < 0).astype(jnp.int32)
    step_base = stats["step_base"]

    def plane_body(p, acc):
        zpfx_acc, prank_acc = acc
        maskS = (q == p) & valid
        maskZ = (q < p) & valid
        zpfx = segs.excl_cumsum(maskZ.astype(jnp.int32))
        ks = segs.excl_cumsum(maskS.astype(jnp.int32))
        base = segs.bcast(step_base[:, :, p])  # even (pair-aligned)
        return (jnp.where(maskS, zpfx, zpfx_acc),
                jnp.where(maskS, (base >> 1) + ks, prank_acc))

    zpfx_acc, prank_acc = jax.lax.fori_loop(
        0, jnp.minimum(stats["planes_max"], PMAX), plane_body,
        (jnp.zeros((C, segs.n), jnp.int32),
         jnp.full((C, segs.n), DUMP, jnp.int32)))

    pr = prank_acc.reshape(-1)
    zp = jnp.zeros(npair + 1, jnp.int32).at[pr].set(zpfx_acc.reshape(-1))
    sg = jnp.zeros(npair + 1, jnp.int32).at[pr].set(sgn.reshape(-1))
    return zp[:npair], sg[:npair]


def _interleave2(a, b):
    """``[a0, b0, a1, b1, ...]`` for 1-D same-shape ``a``/``b``.

    ``jnp.stack(..., axis=-1)`` builds an ``(n, 1)`` intermediate whose
    size-1 lane dimension the TPU layout pads to 128 — a 128x HBM blowup
    (7.5 GB per array at 4K, observed compile-time OOM).  Interior-padded
    adds produce the same interleave while every intermediate keeps a full
    128-wide lane dimension.
    """
    n = a.shape[0]
    dt = jnp.promote_types(a.dtype, b.dtype)
    a, b = a.astype(dt), b.astype(dt)
    if n % 128:
        return jnp.stack([a, b], axis=-1).reshape(-1)
    zero = jnp.zeros((), dt)
    a2 = a.reshape(-1, 128)
    b2 = b.reshape(-1, 128)
    pa = jax.lax.pad(a2, zero, [(0, 0, 0), (0, 1, 1)])
    pb = jax.lax.pad(b2, zero, [(0, 0, 0), (1, 0, 1)])
    return (pa + pb).reshape(-1)


def _finish_tokens(zp, sgn, lin, stats, pyr: Pyramid, channels: int,
                   padded_T: int):
    """Dense completion of the token arrays — no per-coefficient scatters.

    ``zp``/``sgn`` hold each significance pair's zero-prefix and sign at
    its PAIR rank (from kernel A or the XLA fallback; step bases are even,
    so pair rank = token slot / 2).  Everything dense runs in pair space —
    half the elements through the forward fills and diffs: step membership
    via scatter-max + cummax fills over the (tiny) schedule-step tables,
    run values as diffs of consecutive zero-prefixes (+ the step's
    cross-step zero carry at its first pair).  The interleave to token
    space is one stack+reshape; root/plane-count/ref-run/flush tokens land
    as small scatters on the token arrays.
    """
    C = channels
    pix0 = pyr.pixels[0]
    DUMP = padded_T

    npair = padded_T // 2
    pa = jnp.arange(npair, dtype=jnp.int32)
    base_p = stats["base_sched"] >> 1
    nS_sched = stats["nS_sched"]
    bpos = jnp.clip(base_p, 0, npair - 1)
    sb_f = jax.lax.cummax(
        jnp.zeros(npair, jnp.int32).at[bpos].max(base_p))
    se_f = jax.lax.cummax(
        jnp.zeros(npair, jnp.int32).at[bpos].max(base_p + nS_sched))
    in_sig = pa < se_f  # pad pairs / pre-step region: se_f <= pa
    first = pa == sb_f
    cin_add = jnp.zeros(npair, jnp.int32).at[bpos].add(
        jnp.where(stats["valid_sched"] & (nS_sched > 0),
                  stats["cin_sched"], 0))
    prev1 = jnp.concatenate([jnp.zeros(1, jnp.int32), zp[:-1]])
    runval = zp - jnp.where(first, 0, prev1) + cin_add

    zero_p = jnp.zeros(npair, jnp.int32)
    tok_val = _interleave2(jnp.where(in_sig, runval, zp), sgn)
    tok_raw = _interleave2(zero_p, in_sig.astype(jnp.int32))
    tok_vli = _interleave2(in_sig.astype(jnp.int32), zero_p) != 0

    # spare DUMP slot for masked small scatters
    tok_val = jnp.concatenate([tok_val, jnp.zeros(1, jnp.int32)])
    tok_raw = jnp.concatenate([tok_raw, jnp.zeros(1, jnp.int32)])
    tok_vli = jnp.concatenate([tok_vli, jnp.zeros(1, jnp.bool_)])

    # --- root band tokens (encode.c:97-110) -------------------------------
    root = lin[:, :pix0]
    root_cnt, root_base = stats["root_cnt"], stats["root_base"]
    nnzpfx = _excl_cumsum((root != 0).astype(jnp.int32), axis=1)
    i_ix = jnp.arange(pix0, dtype=jnp.int32)[None, :]
    tok_val = tok_val.at[root_base].set(root_cnt)
    tok_vli = tok_vli.at[root_base].set(True)
    r_rank = root_base[:, None] + 1 + i_ix + nnzpfx
    r_ok = root_cnt[:, None] > 0
    r_rank_m = jnp.where(r_ok, r_rank, DUMP).reshape(-1)
    tok_val = tok_val.at[r_rank_m].set(jnp.abs(root).reshape(-1))
    tok_raw = tok_raw.at[r_rank_m].set(
        jnp.broadcast_to(root_cnt[:, None], root.shape).reshape(-1))
    s_ok = r_ok & (root != 0)
    s_rank = jnp.where(s_ok, r_rank + 1, DUMP).reshape(-1)
    tok_val = tok_val.at[s_rank].set((root < 0).astype(jnp.int32).reshape(-1))
    tok_raw = tok_raw.at[s_rank].set(1)

    # --- per-channel plane counts (encode.c:181-182) ----------------------
    pr = stats["planes_base"] + jnp.arange(C, dtype=jnp.int32)
    tok_val = tok_val.at[pr].set(stats["planes"])
    tok_vli = tok_vli.at[pr].set(True)

    # --- ref-pass leading run tokens + final flush (rle_flush) ------------
    rr_rank = jnp.where(stats["refrun_ok"],
                        stats["step_base"] + 2 * stats["nS"], DUMP).reshape(-1)
    tok_val = tok_val.at[rr_rank].set(stats["refrun_val"].reshape(-1))
    tok_vli = tok_vli.at[rr_rank].set(True)
    tok_val = tok_val.at[stats["T"] - 1].set(stats["carry_end"])
    tok_vli = tok_vli.at[stats["T"] - 1].set(True)

    return tok_val[:padded_T], tok_raw[:padded_T], tok_vli[:padded_T]


def _vli_ab(tok_val, tok_vli):
    """Per-token transition parameters, +1-biased (0 = non-VLI no-op):
    ns = clamp(s + k - 2) with k = max(0, ilog2(v + 2^s) - s) collapses to
    ns = clamp(ilog2(v + 2^s) - 2), and ilog2(v + 2^s) = max(s, A +
    (s >= B)) where A = ilog2(v) and B = ceil_log2(2^(A+1) - v) — verified
    token-exact against _vli_next_state on the 4K stream."""
    L = jnp.maximum(_ilog2_i32(jnp.maximum(tok_val, 1)), 0)
    rem = (jnp.int32(2) << L) - tok_val
    Bt = jnp.where(rem <= 1, 0, _ilog2_i32(jnp.maximum(rem - 1, 1)) + 1)
    return jnp.where(tok_vli, (L | (Bt << 5)) + 1, 0)


def _vli_orders(tok_val, tok_vli, padded_T: int):
    """Exact VLI order state at every token via blocked associative scan.

    Token-level layout: the (padded_T,) +1-biased parameter array reshapes
    to (nblk, BLOCK) blocks and transposes once (MXU byte-plane transpose);
    pass A scans the BLOCK rows building each block's 31-state transition
    map, the maps compose with an associative scan (select-chain — an XLA
    gather over the 31-lane axis costs ~7x more), and pass C replays with
    the true entry states, emitting each token's order as int8 rows that
    transpose straight back.  No pair packing: the earlier pair-packed
    variant's stride-2 lane deinterleave/reinterleave cost more than both
    transposes and both scans combined (~25 ms vs ~4+9 ms at 4K).
    State carries are int8.
    """
    TB = BLOCK
    while padded_T % TB:  # tests shrink the pack-block bucket granularity
        TB //= 2
    nblk = padded_T // TB
    ab = _vli_ab(tok_val, tok_vli)
    # Plain XLA transposes: as of jax 0.9 they measure equal to the MXU
    # byte-plane kernel (3.6 vs 3.7 ms at 4K — ops/pallas_transpose.py
    # documents the technique), and they vmap cleanly (the batched encode
    # paths put the batch axis mid-array where a pallas block spec can't).
    ab_b = ab.reshape(nblk, TB).T  # (TB, nblk): one transpose in

    def apply1(s, x):
        """One token's transition from the +1-biased (a | b<<5) params;
        x == 0 marks a non-VLI token (no-op)."""
        a = ((x - 1) & 31).astype(jnp.int8)[:, None]
        b = (((x - 1) >> 5) & 31).astype(jnp.int8)[:, None]
        ns = jnp.clip(
            jnp.maximum(s, a + (s >= b).astype(jnp.int8)) - jnp.int8(2),
            jnp.int8(0), jnp.int8(NSTATE - 1))
        return jnp.where((x > 0)[:, None], ns, s)

    # Pass A: per-block transition map for all NSTATE possible entry states.
    init = jnp.broadcast_to(jnp.arange(NSTATE, dtype=jnp.int8)[None, :],
                            (nblk, NSTATE))
    maps, _ = jax.lax.scan(lambda s, x: (apply1(s, x), None), init, ab_b,
                           unroll=_VLI_UNROLL)

    # Pass B: compose maps across blocks; minc[i] maps an order entering
    # block 0 to the order exiting block i.  Block i's true entry state is
    # the [0, i) composition applied to the stream-initial order 0.
    # b[i, a[i, s]] realized as an NSTATE-way select chain: XLA's gather
    # along a 31-lane axis costs ~34 ms at 4K on TPU; the same compose as
    # 31 compare-selects costs ~5 ms (benchmarks/probe_vli6.py).
    def compose(a, b):
        out = jnp.zeros_like(a)
        for s in range(NSTATE):
            out = jnp.where(a == s, b[:, s : s + 1], out)
        return out

    minc = jax.lax.associative_scan(compose, maps.astype(jnp.int8), axis=0)
    entry = jnp.concatenate(
        [jnp.zeros((1,), jnp.int8), minc[:-1, 0]])

    # Pass C: replay with the true entry state; row output = each token's
    # order BEFORE its own transition (the state it is coded with).
    def stepC(s, x):
        return apply1(s, x), s[:, 0]

    _, orders = jax.lax.scan(stepC, entry[:, None], ab_b,
                             unroll=_VLI_UNROLL)
    return orders.T.reshape(padded_T).astype(jnp.int32)


def _use_pallas() -> bool:
    """Pallas kernel paths run on TPU-class backends; CPU test runs use the
    XLA scatter fallbacks.  DWT_NO_PALLAS=1 forces the fallback.  (Tests
    monkeypatch this to exercise the kernels in interpret mode.)"""
    import os

    return (os.environ.get("DWT_NO_PALLAS") != "1"
            and jax.default_backend() != "cpu")


def _use_pallas_pack(padded_T: int) -> bool:
    from ..ops import pallas_pack

    return _use_pallas() and padded_T % pallas_pack.BLOCKN == 0


def _use_engine() -> bool:
    """Gate for the Hilbert tile engines + MXU transpose (the newest
    Mosaic-dependent pieces).  DWT_NO_ENGINE=1 falls back to XLA
    gathers/transposes while keeping the compaction/pack kernels on —
    bench.py uses it as the first rung of its safe-mode cascade; a
    one-time micro-probe additionally self-disables on Mosaic builds that
    reject the engines' op classes."""
    import os

    if not _use_pallas() or os.environ.get("DWT_NO_ENGINE") == "1":
        return False
    from ..ops.pallas_hilbert import engine_supported

    return engine_supported()


def _layer_boundaries(stats, off, total_bits, pyr: Pyramid, channels: int):
    """Bit offset at which each progressive quality layer ends.

    Layer k of the shared schedule (encode.c:183-220; pre-step counts as
    layer 0) ends where the first token of any step of a later layer
    begins.  Used by the tiled container's global truncation allocation —
    cutting a tile's stream at layer_end[k] keeps layers <= k intact.
    Returns (LMAX,) int32 bit offsets, monotone, final value = total_bits
    (``total_bits`` here is the device int32 total, which is only
    meaningful for valid < 2^31-bit streams — hosts validate the exact
    Python-int total from the partial sums before using these ends).
    """
    C, L = channels, pyr.levels
    pm = stats["planes_max"]
    c_ix = jnp.arange(C, dtype=jnp.int32)[:, None, None]
    l_ix = jnp.arange(L, dtype=jnp.int32)[None, :, None]
    p_ix = jnp.arange(PMAX, dtype=jnp.int32)[None, None, :]
    layers = jnp.where(c_ix == 0, pm - 2 - p_ix + l_ix, pm - 1 - p_ix + l_ix)
    bucket = jnp.maximum(layers, -1) + 1  # pre-step -> 0
    valid = jnp.broadcast_to(p_ix < stats["planes"][:, None, None], (C, L, PMAX))
    BIGBIT = jnp.int32(2**31 - 1)
    start_bits = off[jnp.clip(stats["step_base"], 0, off.shape[0] - 1)]
    start_bits = jnp.where(valid, start_bits, BIGBIT)
    ks = jnp.arange(LMAX)[:, None]
    later = (bucket.reshape(-1)[None, :] > ks) & valid.reshape(-1)[None, :]
    ends = jnp.min(jnp.where(later, start_bits.reshape(-1)[None, :], BIGBIT),
                   axis=1)
    return jnp.minimum(ends, total_bits)


def _codeword_contribs(stats, tok_val, tok_raw, tok_vli, orders,
                       padded_T: int):
    """Per-token codeword bit lengths, final-stream offsets, the <=3
    uint32 word contributions, and each step's first-refinement-bit
    position.  Shared by _pack_bits and the kernel probes
    (benchmarks/probe_kperf.py) so they can never desynchronize.

    Returns (nbits, nref_step, off, refstart, widx, c0, c1, c2)."""
    s = orders
    k = jnp.where(tok_vli, _vli_k(tok_val, s), 0)
    nbits = jnp.where(tok_vli, 2 * k + s + 1, tok_raw)
    # Codeword as explicit (lo, hi) uint32 halves — no int64 anywhere: the
    # VLI codeword is k prefix zeros, a 1, then s+k payload bits, total
    # 2k+s+1 <= 61 bits with s+k <= 30 (magnitudes < 2^29), so the payload
    # itself fits int32 and the >>(32-x) shifts decompose as >>1 >>(31-x)
    # (valid for x == 0 too).  64-bit ops are emulated on TPU and made this
    # the single most expensive stage of the round-1 pipeline.
    payload = tok_val - ((jnp.int32(1) << (s + k)) - (jnp.int32(1) << s))
    lo_vli = ((jnp.int32(1) << k) | (payload << (k + 1))).astype(jnp.uint32)
    hi_vli = (payload.astype(jnp.uint32) >> (31 - k).astype(jnp.uint32))
    lo = jnp.where(tok_vli, lo_vli, tok_val.astype(jnp.uint32))
    hi = jnp.where(tok_vli, hi_vli, 0)

    # int32 bit offsets: single streams stay < 2^31 bits (256 MB); the
    # tiled container is the path for anything larger.  Ref-bit injection:
    # each step's nRef raw bits land after the step's compact tokens.  ONE
    # inclusive cumsum serves every consumer (a 31M-token cumsum costs
    # ~6.4 ms on v5e; the old excl_cumsum(nbits) + cumsum(inject) pair
    # paid it twice):
    #   token offset off[t] = incl[t] - nbits[t]
    #     (= token bits before t + injections at sites <= t, the old
    #      off_base + cumsum(inject) exactly), and
    #   refstart[s] = off[end_s] - (injections at sites <= end_s)
    #                 + refpfx[s],
    # where the injection correction is a PER-STEP sum over the tiny
    # (S, S) schedule grid — no second token-length cumsum.
    nref_step = jnp.where(stats["valid"], stats["nRef"], 0).reshape(-1)
    inj_site = jnp.clip(stats["inj_pos"].reshape(-1), 0, padded_T)
    inject = jnp.zeros(padded_T + 1, jnp.int32).at[
        inj_site].add(nref_step)[:padded_T]
    incl = jnp.cumsum(nbits + inject)
    off = incl - nbits
    end_idx = jnp.clip(stats["step_end"], 0, padded_T - 1).reshape(-1)
    inj_le_end = jnp.sum(
        jnp.where(inj_site[None, :] <= end_idx[:, None],
                  nref_step[None, :], 0), axis=1, dtype=jnp.int32)
    refstart = (off[end_idx] - inj_le_end
                + stats["refpfx"].reshape(-1)).astype(
                    jnp.int32).reshape(stats["refpfx"].shape)

    widx = off >> 5
    sh = (off & 31).astype(jnp.uint32)
    shc = (jnp.uint32(31) - sh)  # >>(32-sh) decomposed as >>1 >>(31-sh)
    c0 = lo << sh
    c1 = ((lo >> 1) >> shc) | (hi << sh)
    c2 = (hi >> 1) >> shc
    return nbits, nref_step, off, refstart, widx, c0, c1, c2


def _pack_bits(lin, stats, tok_val, tok_raw, tok_vli, orders,
               pyr: Pyramid, channels: int, padded_T: int, nwords: int,
               xla_pack: bool = False):
    """Compact-token codewords -> packed u32 stream words (+ offsets).

    Compact tokens (runs/signs/roots/flush) pack via prefix-sum offsets and
    <=3 word scatter-add contributions each.  Refinement bits are injected
    between steps: each step's ref-pass range starts at
    off_base[step_end] + refpfx(step); the j-th refined coefficient of the
    step owns exactly bit (refstart + j).  The refinement bits themselves
    are written by the caller (Pallas kernel B on TPU, _pack_ref_bits
    otherwise).
    """
    C = channels
    nbits, nref_step, off, refstart, widx, c0, c1, c2 = _codeword_contribs(
        stats, tok_val, tok_raw, tok_vli, orders, padded_T)
    # nwords covers the worst-case stream plus slack for the Pallas window
    # and one spare dump slot for masked ref-bit scatters (_stream_words).
    wild_overflow = jnp.int32(0)
    if _use_pallas_pack(padded_T) and not xla_pack:
        from ..ops.pallas_pack import BLOCKN, pack_words_pallas, wild_blocks

        words = pack_words_pallas(widx, c0, c1, c2, nwords)
        # Straggler pass for "wild" blocks the kernel skips.  With step
        # bases padded to BLOCKN (see _stats_from_lin) injection jumps fall
        # between blocks and intra-step token spans are provably within the
        # window budget, so no block is ever wild — this pass is belt and
        # braces (it also keeps the kernel correct if the span analysis is
        # ever violated by a future format extension).  At the old
        # MAXWILD=1536 the padded gather/scatter cost ~455 ms; at 32 it is
        # noise.
        MAXWILD = 64
        nblk = padded_T // BLOCKN
        wild = wild_blocks(widx)
        # size=MAXWILD+1: the sentinel slot detects overflow (more wild
        # blocks than the straggler pass covers) — a silent drop would
        # corrupt the stream, so it is folded into exact_bits below and
        # raised host-side by _check_stream_bits.
        wix = jnp.nonzero(wild, size=MAXWILD + 1, fill_value=nblk)[0]
        wild_overflow = (wix[MAXWILD] != nblk).astype(jnp.int32)
        wix = wix[:MAXWILD]
        tok = wix[:, None] * BLOCKN + jnp.arange(BLOCKN, dtype=jnp.int32)[None, :]
        ok = (tok < padded_T).reshape(-1)
        tokc = jnp.clip(tok, 0, padded_T - 1).reshape(-1)
        wsel = jnp.where(ok, widx[tokc], nwords - 1)
        for k, ck in enumerate((c0, c1, c2)):
            words = words.at[wsel + k].add(jnp.where(ok, ck[tokc], 0))
    else:
        words = jnp.zeros(nwords, jnp.uint32)
        # Word indices are nondecreasing (stream order) — sorted hints.
        words = words.at[widx].add(c0, indices_are_sorted=True)
        words = words.at[widx + 1].add(c1, indices_are_sorted=True)
        words = words.at[widx + 2].add(c2, indices_are_sorted=True)

    # Exact stream length as int32 PARTIAL sums (independent of the int32
    # offset chain): the host totals them in Python ints, so int32
    # bit-offset overflow is detected — if the true total is >= 2^31 the
    # packed words are invalid and the encoder raises (single streams are
    # capped at 2^31 bits; use the tiled container beyond that).  Chunked
    # two-level reduction keeps every device-side partial well below 2^31
    # without any int64 op (64-bit integer ops are emulated on TPU, and
    # this keeps the package x64-free — the process-global jax_enable_x64
    # flip is gone, VERDICT r4 weak #8).
    bits_parts = _bit_partials(nbits, nref_step)
    return words, bits_parts, wild_overflow, off, refstart


def _bit_partials(nbits, nref_step):
    """int32 partial sums whose Python-int total is the exact stream bit
    count.  Per-token bits (<= 64 each) reduce over 2048-token chunks
    (<= 2^17 per chunk) then over 512-chunk groups (<= 2^26 per part);
    per-step refinement-bit counts (<= 2^27 each, the single-stream
    coefficient envelope) reduce over 8-step groups (<= 2^30 per part).
    Every device-side value stays far below 2^31 — no int64 anywhere."""
    def pad_to(x, m):
        r = (-x.shape[0]) % m
        return jnp.concatenate([x, jnp.zeros(r, jnp.int32)]) if r else x

    c1 = pad_to(nbits, 2048).reshape(-1, 2048).sum(axis=1, dtype=jnp.int32)
    tok_parts = pad_to(c1, 512).reshape(-1, 512).sum(axis=1, dtype=jnp.int32)
    ref_parts = pad_to(nref_step.astype(jnp.int32), 8).reshape(-1, 8).sum(
        axis=1, dtype=jnp.int32)
    return jnp.concatenate([tok_parts, ref_parts])


def _kernel_b_meta(stats, segs: _Segs, com, refstart, pyr: Pyramid,
                   padded_T: int, nwords: int):
    """Per-unit metadata for refinement-bit kernel B (shared with the
    kernel probes, see _kernel_a_meta).  ``refstart``: (C, L, PMAX) first
    refinement-bit stream positions from _codeword_contribs."""
    from ..ops import pallas_compact as pc

    p_ix = jnp.arange(PMAX, dtype=jnp.int32)[None, None, :]
    vc = jnp.asarray(segs.ch_valid, jnp.int32)[None, :, None]
    nR_ck = jnp.where(p_ix < stats["planes_max"],
                      vc - stats["nS_ck"] - stats["nZ_ck"], 0)
    rcar = segs.level_excl_cumsum(nR_ck)
    u_bit0 = (refstart.reshape(-1)[com["flat_step"]]
              + rcar.reshape(-1)[com["flat_ck"]])
    nR_u = nR_ck.reshape(-1)[com["flat_ck"]]
    # Floor-align the clip bound: see _kernel_a_meta (the kernel's
    # pl.multiple_of window promise must hold even when clamped).
    ws = jnp.clip((u_bit0 >> 5) & ~jnp.int32(127), 0,
                  (nwords - pc.WREF) // 128 * 128)
    return jnp.stack([
        com["elem"] // pc.SUBB, com["elen"], com["p"], ws, u_bit0 - 32 * ws,
        jnp.zeros_like(nR_u),
        jnp.where(com["valid"], nR_u, 0),
        jnp.zeros_like(nR_u),
    ], axis=1).astype(jnp.int32)


def _ref_bits_pallas(words, refstart, vmag, com, stats, pyr: Pyramid,
                     channels: int, padded_T: int):
    """Kernel-B path: OR refinement bits straight into the stream words."""
    from ..ops import pallas_compact as pc

    segs = _Segs(pyr)
    meta = _kernel_b_meta(stats, segs, com, refstart, pyr, padded_T,
                          words.shape[0])
    out = pc.scatter_refbits_pallas(vmag, meta, words.reshape(1, -1))
    return out.reshape(-1)


def _pack_ref_bits(words, refstart, lin, stats, pyr: Pyramid, channels: int):
    """Scatter every refinement bit directly into the stream words.

    Bit position of the j-th refined coefficient (position order) of step
    (c, l, p) is refstart + j — no tokens, no VLI state involved (they
    are raw bits, encode.c:84-93).
    """
    segs = _Segs(pyr)
    q, mag, _, valid = _detail_q(lin, segs)
    DUMPW = words.shape[0] - 1

    def body(p, words):
        # Step validity matters beyond the element mask only for the
        # budget-truncated schedule (_truncate_schedule): elements of a
        # masked-out step still satisfy q > p and must not be written (their
        # refstart values are collapsed/meaningless there).
        vstep = segs.bcast(stats["valid"][:, :, p].astype(jnp.int32)) > 0
        maskR = (q > p) & valid & vstep
        kr = segs.excl_cumsum(maskR.astype(jnp.int32))
        start = segs.bcast(refstart[:, :, p])
        bitpos = start + kr
        bit = ((mag >> p) & 1).astype(jnp.uint32)
        contrib = bit << (bitpos & 31).astype(jnp.uint32)
        w = jnp.where(maskR, bitpos >> 5, DUMPW).reshape(-1)
        return words.at[w].add(jnp.where(maskR, contrib, 0).reshape(-1))

    return jax.lax.fori_loop(
        0, jnp.minimum(stats["planes_max"], PMAX), body, words)


def _seg_pallas_ok(pyr: Pyramid, padded_T: int) -> bool:
    # Kernel A encodes (zpfx << 1) | sign in one int32, which needs every
    # zero-run prefix < 2^30 — guaranteed when no detail segment can hold
    # 2^30 elements (only ~37K x 37K images break it; the XLA fallback has
    # no such limit).
    seg_max = max(
        (pyr.pixels[l + 1] - pyr.pixels[l] for l in range(pyr.levels)),
        default=0) + ALIGN
    return _use_pallas_pack(padded_T) and seg_max < (1 << 30)


def _stage2_tokens(lin, stats, pyr: Pyramid, channels: int, padded_T: int):
    """Stage-2 first half: token build + VLI order scan.

    Split from the emit half so the two XLA programs compile independently
    (and concurrently — Encoder._get_stage2 warms both halves from two
    threads): the round-3 monolith's relay-side cold compile took ~40 min
    and was the dominant cold-start cost (VERDICT r3 weak #4)."""
    C = channels
    if _seg_pallas_ok(pyr, padded_T):
        zp, sgn, _vmag, _com = _sig_tokens_pallas(lin, stats, pyr, C,
                                                  padded_T)
    else:
        zp, sgn = _sig_tokens_xla(lin, stats, pyr, C, padded_T)
    tv, tr, tf = _finish_tokens(zp, sgn, lin, stats, pyr, C, padded_T)
    orders = _vli_orders(tv, tf, padded_T)
    return tv, tr, tf, orders


def _stage2_emit(lin, stats, tv, tr, tf, orders, pyr: Pyramid,
                 channels: int, padded_T: int, xla_pack: bool = False):
    """Stage-2 second half: codeword packing + refinement bits + layer
    boundaries.  Recomputes the packed-element rows / unit metadata (cheap
    elementwise + tiny tables; CSE'd away when run fused in the monolith)."""
    C = channels
    nwords = _stream_words(pyr, C, padded_T)
    use_pallas = _seg_pallas_ok(pyr, padded_T)
    words, bits_parts, wild, off, refstart = _pack_bits(
        lin, stats, tv, tr, tf, orders, pyr, C, padded_T, nwords,
        xla_pack=xla_pack)
    if use_pallas:
        segs = _Segs(pyr)
        vmag = _packed_elems(lin, segs)
        com = _unit_common(stats, segs, pyr, C)
        words = _ref_bits_pallas(words, refstart, vmag, com, stats, pyr, C,
                                 padded_T)
    else:
        words = _pack_ref_bits(words, refstart, lin, stats, pyr, C)
    # int32 device total: exact for valid (< 2^31-bit) streams; hosts
    # validate the Python-int total of bits_parts before trusting ends.
    tot32 = jnp.sum(bits_parts, dtype=jnp.int32)
    layer_ends = _layer_boundaries(stats, off, tot32, pyr, C)
    return words, bits_parts, wild, layer_ends


def _stage2_pipeline(lin, stats, pyr: Pyramid, channels: int, padded_T: int):
    """Full device entropy-coding stage: tokens -> VLI orders -> packed
    words (+ refinement bits) -> layer boundaries.

    On TPU the two per-coefficient placement steps run as Pallas MXU
    compaction kernels (ops/pallas_compact.py); elsewhere (CPU tests,
    DWT_NO_PALLAS=1) XLA scatters produce bit-identical results.

    This single-fused form remains only for tests/probes that want one
    program; every production path (Encoder, BatchEncoder, ShardedEncoder,
    encode_tiled_sharded) composes the two halves as independently-jitted
    programs via :func:`compose_stage2` (compile latency: the halves
    compile concurrently, VERDICT r3 #4 / r4 #5)."""
    C = channels
    tv, tr, tf, orders = _stage2_tokens(lin, stats, pyr, C, padded_T)
    return _stage2_emit(lin, stats, tv, tr, tf, orders, pyr, C, padded_T)


def compose_stage2(fa, fb, tag: str = ""):
    """Compose the two stage-2 halves (callables with _stage2_tokens /
    _stage2_emit signatures — optionally vmapped or shard_mapped) into one
    (lin, stats) -> (words, bits_parts, wild, layer_ends) function over TWO
    independently-compiled programs.  The first invocation compiles both
    halves CONCURRENTLY from two threads (the emit half lowers against
    eval_shape placeholders, no execution needed) — cold start pays ~max
    of the halves instead of the fused monolith's sum — and each half
    goes through the explicit executable store (runtime.cache.aot_cached,
    keyed by package source + geometry, immune to the relay backend's
    per-session XLA cache-key drift)."""
    from ..runtime.cache import aot_cached

    state = {}

    def run(lin, stats):
        if "ca" not in state:
            import concurrent.futures as cf

            mid = jax.eval_shape(fa, lin, stats)
            try:
                with cf.ThreadPoolExecutor(2) as ex:
                    fa_c = ex.submit(aot_cached, fa, f"{tag}tokens",
                                     (lin, stats))
                    fb_c = ex.submit(aot_cached, fb, f"{tag}emit",
                                     (lin, stats), tuple(mid))
                    state["ca"] = fa_c.result()
                    state["cb"] = fb_c.result()
            except Exception:  # pragma: no cover — e.g. a backend that
                state["ca"] = jax.jit(fa)   # rejects AOT serialization;
                state["cb"] = jax.jit(fb)   # plain jits still work
        if not state.get("validated"):
            # A stored executable can deserialize yet fail at DISPATCH
            # (observed on XLA:CPU); the first call must degrade to plain
            # jits, not take down the encode.
            try:
                tv, tr, tf, orders = state["ca"](lin, stats)
                out = state["cb"](lin, stats, tv, tr, tf, orders)
                jax.block_until_ready(out)
                state["validated"] = True
                return out
            except Exception:  # noqa: BLE001
                state["ca"], state["cb"] = jax.jit(fa), jax.jit(fb)
                state["validated"] = True
        tv, tr, tf, orders = state["ca"](lin, stats)
        return state["cb"](lin, stats, tv, tr, tf, orders)

    run._state = state
    return run


def _truncate_schedule(sh: dict, capacity: int, pyr: Pyramid, channels: int):
    """Budget-bounded work (bytes.h:75-78 as *work skipping*, not just
    output slicing): given host copies of the stage-1 stats, mask every
    schedule step that provably starts at or beyond ``capacity`` bytes and
    shrink the token count accordingly.  The emitted bits below the budget
    are untouched (every included token keeps its full-encode rank, VLI
    order and bit offset — prefix property), so ``stream[:capacity]`` is
    byte-identical to slicing the full encode, while deep truncation runs
    stage 2 over a small fraction of the tokens.

    Inclusion uses per-step LOWER bounds on bit cost (run VLI >= 1 bit +
    sign bit per significant pair, >= 1 bit per ref-run token, exactly 1
    bit per refinement bit, exact root-band bits): true bits >= bound, so
    a step whose bounded start reaches the budget truly starts past it.

    Returns a dict of replacement stats leaves (numpy), or None when the
    whole schedule might be needed (encode falls back to the full path).
    """
    cap_bits = capacity * 8
    order = sh["order"]
    valid_s = sh["valid_sched"]
    nS_s = sh["nS_sched"].astype(np.int64)
    base_s = sh["base_sched"]
    S = order.size
    C, L = channels, pyr.levels
    nref_flat = np.where(sh["valid"].reshape(-1), sh["nRef"].reshape(-1), 0)
    nref_s = nref_flat[order].astype(np.int64)
    rro_s = sh["refrun_ok"].reshape(-1)[order] & valid_s
    lb_s = 2 * nS_s + rro_s.astype(np.int64) + nref_s
    pre = _root_bits_host(sh, pyr.pixels[0]) + C  # + C 1-bit plane VLIs
    start_lb = pre + np.cumsum(lb_s) - lb_s
    include = start_lb < cap_bits
    if include.all():
        return None
    k = int(np.nonzero(include)[0][-1]) if include.any() else -1
    return _mask_schedule_suffix(sh, k, pyr, channels)


def _mask_schedule_suffix(sh: dict, k: int, pyr: Pyramid, channels: int):
    """Mask every schedule step AFTER index ``k`` (schedule order); shared
    tail of _truncate_schedule and the tiled layer-cap path.  Returns the
    replacement stats leaves (numpy), or None if nothing is cut."""
    order = sh["order"]
    base_s = sh["base_sched"]
    S = order.size
    C, L = channels, pyr.levels
    T_old = int(sh["T"])
    T_new = int(base_s[k + 1]) + 1 if k + 1 < S else T_old
    if T_new >= T_old:
        return None
    excl = np.zeros(S, bool)
    excl[k + 1:] = True
    shape = (C, L, PMAX)
    valid_new = sh["valid"].reshape(-1).copy()
    valid_new[order[excl]] = False
    rro_new = sh["refrun_ok"].reshape(-1).copy()
    rro_new[order[excl]] = False
    inj_new = sh["inj_pos"].reshape(-1).copy()
    if k >= 0:
        # The last included step injects its refinement bits at the flush
        # slot, exactly as the full schedule's final step does.
        inj_new[order[k]] = T_new - 1
    vs_new = sh["valid_sched"].copy()
    vs_new[k + 1:] = False
    ns_new = sh["nS_sched"].copy()
    ns_new[k + 1:] = 0
    return dict(
        valid=valid_new.reshape(shape),
        refrun_ok=rro_new.reshape(shape),
        inj_pos=inj_new.reshape(shape).astype(np.int32),
        valid_sched=vs_new,
        nS_sched=ns_new.astype(np.int32),
        T=np.int32(T_new),
    )


def _schedule_layers_host(sh: dict, pyr: Pyramid, channels: int):
    """(S,) quality-layer bucket of each schedule step, in schedule order
    (pre-step = 0; mirrors _layer_boundaries' bucket)."""
    C, L = channels, pyr.levels
    order = sh["order"]
    pm = int(sh["planes_max"])
    c_s = order // (L * PMAX)
    l_s = (order // PMAX) % L
    p_s = order % PMAX
    layers = np.where(c_s == 0, pm - 2 - p_s + l_s, pm - 1 - p_s + l_s)
    return np.maximum(layers, -1) + 1


def _layer_lb_bytes_host(sh: dict, pyr: Pyramid, channels: int,
                         n_layers: int):
    """(n_layers,) LOWER-bound byte cost each quality layer adds to this
    tile's stream (floor of the bit bound; layer 0 includes the exact
    root-band + plane-count bits).  True layer costs are >= these, so a
    budget waterline computed from them includes a SUPERSET of the layers
    the true allocation will include — masking beyond it is always safe."""
    C = channels
    order = sh["order"]
    valid_s = sh["valid_sched"]
    nS_s = sh["nS_sched"].astype(np.int64)
    nref_flat = np.where(sh["valid"].reshape(-1), sh["nRef"].reshape(-1), 0)
    nref_s = nref_flat[order].astype(np.int64)
    rro_s = sh["refrun_ok"].reshape(-1)[order] & valid_s
    lb_s = np.where(valid_s, 2 * nS_s + rro_s.astype(np.int64) + nref_s, 0)
    buckets = _schedule_layers_host(sh, pyr, C)
    bits = np.zeros(n_layers, np.int64)
    np.add.at(bits, np.clip(buckets, 0, n_layers - 1), lb_s)
    bits[0] += _root_bits_host(sh, pyr.pixels[0]) + C
    return bits // 8


def _truncate_schedule_to_layer(sh: dict, max_layer: int, pyr: Pyramid,
                                channels: int):
    """Mask every schedule step of a quality layer beyond ``max_layer``
    (steps are schedule-ordered, so later layers form a suffix).  Returns
    replacement stats leaves or None (nothing cut)."""
    buckets = _schedule_layers_host(sh, pyr, channels)
    include = (buckets <= max_layer) & sh["valid_sched"]
    if not include.any():
        k = -1
    else:
        k = int(np.nonzero(include)[0][-1])
    return _mask_schedule_suffix(sh, k, pyr, channels)


_TRUNC_STATS_KEYS = ("order", "valid_sched", "nS_sched", "base_sched",
                     "valid", "nRef", "refrun_ok", "inj_pos", "T",
                     "root_cnt", "root_base", "planes_base", "planes_max")


# ---------------------------------------------------------------------------
# Public encoder
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _check_planes(planes_max: int) -> int:
    """Magnitudes must stay below 2^29 (bits 29/30 are the sig/ref flags,
    encode.c:115-128).  A transform magnitude beyond that cannot be coded
    by the format — hard error, never a silently-wrong stream."""
    if planes_max > PMAX:
        raise ValueError(
            f"coefficient magnitude needs {planes_max} bitplanes; the format "
            f"supports at most {PMAX} (magnitudes < 2^29, reference "
            "encode.c:115-128)")
    return planes_max


def _total_bits_host(bits_parts) -> int:
    """Exact stream bit count from the device's int32 partial sums
    (_bit_partials), totaled in Python ints so nothing can wrap."""
    return int(np.asarray(bits_parts, dtype=np.int64).sum())


def _check_stream_bits(total_bits: int, wild_overflow: bool = False) -> int:
    """Single-stream bit offsets are int32; a stream at or beyond 2^31 bits
    (256 MB) would have wrapped them.  The exact count is a Python-int
    total of int32 device partials (_bit_partials), so overflow is
    detected — not silently emitted.  Larger images must use the tiled
    container (dwt_tpu.codec.tiled.encode_tiled)."""
    if wild_overflow:
        raise AssertionError(
            "internal: Pallas pack wild-block overflow (more than MAXWILD "
            "blocks outside their group/own windows) — the straggler pass "
            "cannot cover this stream; report the image, and encode with "
            "DWT_NO_PALLAS=1 as a workaround")
    if total_bits >= 2**31:
        raise ValueError(
            f"stream needs {total_bits} bits; single .dwt streams are "
            "limited to 2^31 bits — encode with the tiled container "
            "(dwt_tpu.codec.tiled.encode_tiled) instead")
    return total_bits


def _stream_words(pyr: Pyramid, channels: int, padded_T: int) -> int:
    """Static output word-buffer size: worst-case compact-token bits
    (64/token) + worst-case refinement bits (PMAX per detail coefficient),
    plus the Pallas packer's window slack and one spare dump slot."""
    from ..ops import pallas_pack

    n_det = (pyr.total - pyr.pixels[0]) * channels
    return (2 * padded_T + (n_det * PMAX) // 32
            + pallas_pack._win() + pallas_pack._win1() + 520)


def _bucket(t: int) -> int:
    """Pad token counts to coarse size buckets (sixteenths of powers of
    two, multiples of the Pallas pack block) so each image geometry
    compiles at most a few stage-2 variants regardless of content while
    every per-token stage pays <= 1/9 padding overhead (the old
    {1, 0.75} x 2^k lattice cost up to 1/3 — 13% on the 4K bench)."""
    from ..ops import pallas_pack

    t = max(t, 4 * pallas_pack.BLOCKN)
    b = 1 << (t - 1).bit_length()
    for m in range(9, 16):
        if m * b // 16 >= t:
            b = m * b // 16
            break
    return _round_up(b, pallas_pack.BLOCKN)


class Encoder:
    """Caches jitted stages per (geometry, channels); reusable across images."""

    def __init__(self, width: int, height: int, channels: int):
        self.pyr = compute_pyramid(width, height)
        self.channels = channels
        self.gray = channels == 1
        _use_engine()  # prime the eager engine micro-probe BEFORE any jit
        # trace calls it (during tracing the probe cannot run and the
        # engines would silently stay off for that program)
        perm_np, _, _ = padded_layout(self.pyr, ALIGN)
        self._perm = jax.device_put(jnp.asarray(perm_np))
        pyr, C, gray = self.pyr, channels, self.gray

        def stage1_fn(img, perm):
            return _transform_and_stats(img, pyr, C, gray, perm)

        state = {}

        def stage1(img, perm):
            # Compiled through the explicit executable store on first use
            # (runtime.cache.aot_cached): immune to the relay backend's
            # per-session XLA cache-key drift.  First call degrades to a
            # plain jit if a stored executable fails at dispatch.
            if "c" not in state:
                from ..runtime.cache import aot_cached

                try:
                    state["c"] = aot_cached(
                        stage1_fn,
                        f"stage1-{pyr.width}x{pyr.height}c{C}-", (img, perm))
                    out = state["c"](img, perm)
                    jax.block_until_ready(out)
                    return out
                except Exception:  # pragma: no cover
                    state["c"] = jax.jit(stage1_fn)
            return state["c"](img, perm)

        self._stage1 = stage1
        self._stage2 = {}

    def _get_stage2(self, padded_T: int, xla_pack: bool = False):
        """Composed (lin, stats) -> (words, bits_parts, wild, layer_ends)
        over TWO independently-jitted halves (compose_stage2).

        ``xla_pack=True`` is the wild-block-overflow fallback variant: the
        codeword packing runs as XLA scatter-adds (no window budget, no
        wild blocks) while everything else keeps its kernels — built
        lazily, compiled only if an overflow ever actually occurs."""
        key = (padded_T, xla_pack)
        fn = self._stage2.get(key)
        if fn is None:
            pyr, C = self.pyr, self.channels
            self._stage2[key] = fn = compose_stage2(
                functools.partial(_stage2_tokens, pyr=pyr, channels=C,
                                  padded_T=padded_T),
                functools.partial(_stage2_emit, pyr=pyr, channels=C,
                                  padded_T=padded_T, xla_pack=xla_pack),
                tag=(f"enc{pyr.width}x{pyr.height}c{C}-t{padded_T}"
                     f"{'-xlapack' if xla_pack else ''}-"))
        return fn

    def header(self) -> bytes:
        w, h = self.pyr.width, self.pyr.height
        return bytes([
            ord("W"), ord("5") if self.gray else ord("6"),
            (w - 1) & 255, ((w - 1) >> 8) & 255,
            (h - 1) & 255, ((h - 1) >> 8) & 255,
        ])

    def encode(self, img: np.ndarray, capacity: int = 0) -> bytes:
        return self.encode_with_stats(img, capacity)[0]

    def encode_with_stats(self, img: np.ndarray, capacity: int = 0) -> tuple:
        """Returns (stream bytes, info dict) — the structured counterpart of
        the reference's stderr bit counters (encode.c:176,180,230)."""
        img = np.asarray(img)
        if img.ndim == 2:
            img = img[..., None]
        t0 = time.perf_counter()
        lin, stats = self._stage1(jnp.asarray(img), self._perm)
        T = int(stats["T"])
        _check_planes(int(stats["planes_max"]))
        if capacity > 0:
            # Budget-bounded work: mask schedule steps past the byte budget
            # BEFORE stage 2 so deep truncation skips the coding work the
            # reference's put_byte cap would never perform (encode.c:192-216).
            host = jax.device_get({k: stats[k] for k in _TRUNC_STATS_KEYS})
            upd = _truncate_schedule(host, capacity, self.pyr, self.channels)
            if upd is not None:
                stats = {**stats,
                         **{k: jnp.asarray(v) for k, v in upd.items()}}
                T = int(upd["T"])
        words, bits_parts, wild, layer_ends = \
            self._get_stage2(_bucket(T))(lin, stats)
        if bool(int(wild)):
            # Wild-block overflow (> MAXWILD pack blocks outside their
            # windows): content-dependent and believed unreachable with
            # block-aligned step bases, but fail-open, not fail-closed —
            # re-emit through the XLA-scatter pack variant, which has no
            # window budget.  Bytes are identical by construction; only
            # this frame pays the fallback's one-time compile.
            import warnings

            warnings.warn(
                "dwt_tpu.encode: Pallas pack wild-block overflow; "
                "re-packing this frame via the XLA fallback (slower, "
                "byte-identical).  Please report the image.",
                RuntimeWarning, stacklevel=2)
            words, bits_parts, wild, layer_ends = \
                self._get_stage2(_bucket(T), xla_pack=True)(lin, stats)
        total_bits = _check_stream_bits(_total_bits_host(bits_parts),
                                        bool(int(wild)))
        nbytes = (total_bits + 7) // 8
        # Slice on device so only the real stream transfers D2H.
        payload = np.asarray(words[: (nbytes + 3) // 4]).tobytes()[:nbytes]
        stream = self.header() + payload
        if capacity > 0:
            stream = stream[:capacity]
        dt = time.perf_counter() - t0
        if os.environ.get("DWT_SELFCHECK") == "1" and capacity <= 0:
            # Sanitizer mode (the codec analog of the reference's ASan
            # Makefile line): every emitted stream must decode losslessly
            # before it is returned.  Catches any device-side packing
            # corruption at the source instead of at a far-away consumer.
            from . import decoder as _decoder

            back, _ = _decoder.decode(stream)
            if not np.array_equal(np.asarray(back).reshape(img.shape), img):
                raise AssertionError(
                    "DWT_SELFCHECK: stream does not decode to the input")
        le = np.asarray(layer_ends)
        info = {
            "tokens": T,
            "payload_bits": total_bits,
            # Reference-style stage counters (encode.c:176,180): header
            # bytes and root-band coding bits, separately.
            "meta_bits": 8 * len(self.header()),
            "root_bits": _root_bits_host(stats, self.pyr.pixels[0]),
            "bytes": len(stream),
            "planes": np.asarray(stats["planes"]).tolist(),
            "levels": self.pyr.levels,
            "layer_end_bytes": np.unique((le[le < 2**31 - 1] + 7) // 8).tolist(),
            "seconds": dt,
            "mps": self.pyr.total / 1e6 / dt,
        }
        return stream, info


def _root_bits_host(stats, pix0: int) -> int:
    """Exact bit count of the root-band coding (encode.c:97-110, the
    reference's "bits for root image" stderr counter) from stage-1 stats,
    replayed on host: per channel one VLI(cnt) through the shared adaptive
    order chain (which starts at 0 — root tokens are the stream's first),
    then cnt raw magnitude bits per coefficient + one sign bit per nonzero.
    """
    root_cnt = np.asarray(stats["root_cnt"])
    root_base = np.asarray(stats["root_base"])
    planes_base = int(stats["planes_base"])
    C = root_cnt.shape[0]
    ends = np.concatenate([root_base[1:], [planes_base]])
    bits = 0
    s = 0
    for c in range(C):
        v, cnt = int(root_cnt[c]), int(root_cnt[c])
        k = max(_ilog2_host(v + (1 << s)) - s, 0)
        bits += 2 * k + s + 1
        s = min(max(s + k - 2, 0), NSTATE - 1)
        if cnt > 0:
            nnz = int(ends[c] - root_base[c]) - 1 - pix0
            bits += pix0 * cnt + nnz
    return bits


def _ilog2_host(x: int) -> int:
    return x.bit_length() - 1


@functools.lru_cache(maxsize=64)
def get_encoder(width: int, height: int, channels: int) -> Encoder:
    return Encoder(width, height, channels)


# Coefficient-count ceiling for a single .dwt stream on one chip: beyond
# this the stream's int32 bit offsets (and HBM working set) can overflow,
# so encode() routes to the tiled .dwtt container instead — preserving the
# reference's 65536x65536 format envelope (encode.c:140) behind one API.
# The reroute is EXPLICIT: a one-time warning names it (a .dwtt container
# is not readable by the reference decoder; pass container=False to
# require a single stream and get a hard error instead, or use
# get_encoder().encode() directly).  Tests shrink the ceiling to exercise
# the route.
SINGLE_STREAM_MAX_COEFFS = 1 << 27

_warned_container = False


def _warn_container(reason: str):
    global _warned_container
    if not _warned_container:
        import warnings

        warnings.warn(
            f"dwt_tpu.encode: {reason}; writing a tiled .dwtt container "
            "instead of a single .dwt stream (dwt_tpu decodes it "
            "transparently; the reference C decoder cannot).  Pass "
            "container=False to force a single stream.",
            UserWarning, stacklevel=3)
        _warned_container = True


def encode(img: np.ndarray, gray: bool | None = None, capacity: int = 0,
           container: bool | None = None) -> bytes:
    """Encode to a .dwt stream (or .dwtt container for oversized images).

    ``container``: None (default) auto-routes images beyond the
    single-stream envelope to the tiled container with a one-time warning;
    True forces the container; False forbids it (raises instead).
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    if container:
        from . import tiled

        return tiled.encode_tiled(img, budget=capacity)
    if h * w * c > SINGLE_STREAM_MAX_COEFFS:
        if container is False:
            raise ValueError(
                f"{w}x{h}x{c} exceeds the single-stream envelope "
                f"({SINGLE_STREAM_MAX_COEFFS} coefficients); use the tiled "
                "container (container=True / encode_tiled)")
        _warn_container(f"{w}x{h}x{c} exceeds the single-stream envelope")
        from . import tiled

        return tiled.encode_tiled(img, budget=capacity)
    try:
        return get_encoder(w, h, c).encode(img, capacity)
    except ValueError as e:
        if "2^31 bits" not in str(e) or container is False:
            raise
        _warn_container("stream exceeds 2^31 bits")
        from . import tiled

        return tiled.encode_tiled(img, budget=capacity)
