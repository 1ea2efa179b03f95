"""Pallas TPU kernel: monotone bit-stream packing via MXU one-hot matmuls.

Replaces the three XLA scatter-adds that assemble compact-token codewords
into stream words (~8 ns/element, sort-lowered) with a sequential-grid
kernel that exploits the structure XLA cannot see: token word indices are
*nondecreasing*, so each block of tokens touches one small contiguous word
window.  Within a block, sub-chunks of 256 tokens land in a <= 514-word
span; a one-hot (word == target) int8 matrix contracted with the nibble
planes of the contributions compacts them on the MXU (s8 x s8 -> s32 is
exact; 4-bit pieces stay positive in s8), and the eight nibble rows
recombine with shifted adds.  Windows are 128-lane-aligned; consecutive
blocks' overlapping boundary words are safe because the TPU grid executes
sequentially and each block read-modify-writes its window via DMA.

Mosaic notes (hard-won): everything stays 2-D with the token/word axis in
lanes; no value-level dynamic_slice (refs + pl.ds only); no 64-bit values
(x64 fori indices are i64 -> the sub-chunk loop is unrolled); u32->s8
conversions route via s32; unsigned reductions are unavailable (sum in s32,
bitcast back).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # test hook: run the kernel in interpret mode (CPU)

BLOCKN = 2048     # tokens per block (wild-mask granularity)
KGRP = 4          # blocks per grid step: ONE window DMA pair serves KGRP
                  # consecutive blocks (the window read-modify-write's DMA
                  # latency, not its bandwidth, dominated the kernel —
                  # consecutive blocks' windows overlap ~90% anyway)
SUB = 512         # tokens per MXU sub-chunk
SUBWIN = 768      # big-tier rows; sub-chunks spanning more are "wild"
SUBSMALL = 256    # small-tier rows: typical 512-token spans are ~60 words


def _win() -> int:
    """Group window: worst-case words of KGRP blocks + alignment slack.
    (Computed from the current module constants so tests can shrink
    BLOCKN/KGRP.)"""
    return KGRP * 2 * BLOCKN + 256


def _win1() -> int:
    """Own-window size for blocks that jumped out of their group window
    (a step's refinement-bit injection landed mid-group): the round-3
    per-block window, worst-case words of one block + alignment slack."""
    return 2 * BLOCKN + 256


def _subs_ok(row, k):
    """Every sub-chunk span of block k fits its tier window."""
    ok = None
    for s in range(BLOCKN // SUB):
        c = (row[k * BLOCKN + s * SUB + SUB - 1]
             - row[k * BLOCKN + s * SUB]) <= SUBWIN - 131
        ok = c if ok is None else ok & c
    return ok


def wild_blocks(widx):
    """(nblk,) bool — blocks the kernel skips (handled by the caller's
    straggler pass).  MUST mirror the kernel's placement criteria exactly:
    a block is covered when (a) it fits the group window rooted at its
    group's aligned start, or (b) its own 1-block window fits AND is
    disjoint from the group window (so the two scratch RMWs cannot
    interleave); in both cases every sub-chunk span must fit its tier.
    With step bases padded to BLOCKN (encoder._stats_from_lin) a jump
    only lands between blocks, so case (b) covers mid-group injection
    jumps and no block is ever wild in practice; the pass is belt and
    braces.  ``len(widx)`` should be a multiple of KGRP * BLOCKN (the
    wrapper pads; a partial tail group is treated as its own group)."""
    w = widx.reshape(-1, BLOCKN)
    nblk = w.shape[0]
    g0 = (w[::KGRP, 0] // 128) * 128          # aligned group window starts
    reps = [KGRP] * (nblk // KGRP) + ([nblk % KGRP] if nblk % KGRP else [])
    w0 = jnp.repeat(g0, jnp.asarray(reps), total_repeat_length=nblk)
    own = (w[:, 0] // 128) * 128              # aligned own-window starts
    in_group = (w[:, BLOCKN - 1] - w0) <= _win() - SUBWIN - 131
    own_ok = ((w[:, BLOCKN - 1] - own) <= _win1() - SUBWIN - 131) \
        & (own >= w0 + _win())
    ok = in_group | own_ok
    for s in range(BLOCKN // SUB):
        ok &= (w[:, s * SUB + SUB - 1] - w[:, s * SUB]) <= SUBWIN - 131
    return ~ok


def _kernel(ws_ref, widx_ref, c_ref, words_in, words_out,
            scratch, scr1, sem_in, sem_out, sem1_in, sem1_out):
    del words_in  # aliased with words_out
    g = pl.program_id(0)
    ws_al = pl.multiple_of(ws_ref[g], 128)  # aligned group window start
    WIN, WIN1 = _win(), _win1()
    row = widx_ref[0]

    # Pull the group window once (read-modify-write across groups is safe:
    # the grid is sequential; the own-window path below is gated on being
    # DISJOINT from [ws_al, ws_al + WIN), so its RMW cannot interleave
    # with this scratch's deferred write-back).
    copy_in = pltpu.make_async_copy(
        words_out.at[:, pl.ds(ws_al, WIN)], scratch, sem_in)
    copy_in.start()
    copy_in.wait()

    for k in range(KGRP):
        subs = _subs_ok(row, k)
        in_group = ((row[k * BLOCKN + BLOCKN - 1] - ws_al)
                    <= WIN - SUBWIN - 131) & subs
        own = (row[k * BLOCKN] // 128) * 128
        own_path = ((row[k * BLOCKN + BLOCKN - 1] - own)
                    <= WIN1 - SUBWIN - 131) & (own >= ws_al + WIN) \
            & ~in_group & subs

        @pl.when(in_group)
        def _(k=k):
            _pack_block(k, ws_al, widx_ref, c_ref, scratch, WIN)

        @pl.when(own_path)
        def _(k=k, own=own):
            own = pl.multiple_of(own, 128)
            cp_in = pltpu.make_async_copy(
                words_out.at[:, pl.ds(own, WIN1)], scr1, sem1_in)
            cp_in.start()
            cp_in.wait()
            _pack_block(k, own, widx_ref, c_ref, scr1, WIN1)
            cp_out = pltpu.make_async_copy(
                scr1, words_out.at[:, pl.ds(own, WIN1)], sem1_out)
            cp_out.start()
            cp_out.wait()

    copy_out = pltpu.make_async_copy(
        scratch, words_out.at[:, pl.ds(ws_al, WIN)], sem_out)
    copy_out.start()
    copy_out.wait()


def _pack_block(k, ws_al, widx_ref, c_ref, scratch, WIN):
    def sub_chunk(base):
        lw = widx_ref[:, pl.ds(k * BLOCKN + base, SUB)] - ws_al  # (1, SUB)
        base0 = jnp.maximum(lw[0, 0], 0)
        rel = lw - base0  # [0, span]; span <= SUBWIN - 131 for tame blocks
        # Two-stage split placement with ONE one-hot for all three word
        # contributions: oh over the c0 targets only (SUB lanes instead of
        # 3*SUB); the 24 stacked nibble-plane rows (c0|c1|c2) contract in
        # one matmul, and c1/c2's +1/+2 word offsets become lane shifts of
        # their recombined dense rows.  The dense (1, T) span-relative
        # words then shift-merge into the 128-aligned scratch window via a
        # small (T+136, T) one-hot over their byte planes — so the 128-lane
        # misalignment costs O(T^2) instead of O(128 * 3*SUB) per tier.
        c_at = 3 * BLOCKN * k + base
        vals = jnp.concatenate(
            [c_ref[:, pl.ds(c_at, SUB)],
             c_ref[:, pl.ds(BLOCKN + c_at, SUB)],
             c_ref[:, pl.ds(2 * BLOCKN + c_at, SUB)]], axis=0)  # (3, SUB)
        # nibble planes (24, SUB): rows [8c + k] = nibble k of contribution
        # c; 4-bit pieces stay positive in s8 (u32 -> s8 routes via s32).
        stacked = jnp.concatenate(
            [jnp.broadcast_to(vals[c : c + 1], (8, SUB)) for c in range(3)],
            axis=0)  # (24, SUB)
        shifts = jnp.concatenate(
            [jax.lax.broadcasted_iota(jnp.uint32, (8, 1), 0)] * 3,
            axis=0) * 4
        v8 = ((stacked >> shifts) & jnp.uint32(0xF)).astype(
            jnp.int32).astype(jnp.int8)

        def place(T):
            oh = (jax.lax.broadcasted_iota(jnp.int32, (T, SUB), 0)
                  == rel).astype(jnp.int8)
            acc = jax.lax.dot_general(
                v8, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # (24, T)
            rshift = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) * 4
            z = jnp.zeros((1, 1), jnp.int32)
            w0 = jnp.sum(acc[0:8] << rshift, axis=0, keepdims=True,
                         dtype=jnp.int32)
            w1 = jnp.sum(acc[8:16] << rshift, axis=0, keepdims=True,
                         dtype=jnp.int32)
            w2 = jnp.sum(acc[16:24] << rshift, axis=0, keepdims=True,
                         dtype=jnp.int32)
            dense = (w0 + jnp.concatenate([z, w1[:, :-1]], axis=1)
                     + jnp.concatenate([z, z, w2[:, :-2]], axis=1))
            b8 = jnp.concatenate(
                [((dense >> (8 * k)) & 0xFF).astype(jnp.int8)
                 for k in range(4)], axis=0)  # (4, T)
            # T2 rounds up to a 128 multiple so the window-tail clamp
            # (WIN - T2) is truly 128-aligned — pl.multiple_of on a
            # misaligned value corrupts the store on hardware while
            # passing interpret mode (never reachable for tame blocks,
            # but the promise must hold unconditionally).
            T2 = -(-(T + 136) // 128) * 128
            assert WIN % 128 == 0
            sub_o = pl.multiple_of(
                jnp.minimum((base0 // 128) * 128, WIN - T2), 128)
            delta = base0 - sub_o
            oh2 = (jax.lax.broadcasted_iota(jnp.int32, (T2, T), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (T2, T), 1)
                   + delta).astype(jnp.int8)
            acc2 = jax.lax.dot_general(
                b8, oh2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # (4, T2)
            out = jnp.zeros((1, T2), jnp.int32)
            for k in range(4):
                out = out | ((acc2[k : k + 1] & 0xFF) << (8 * k))
            scratch[:, pl.ds(sub_o, T2)] = (
                scratch[:, pl.ds(sub_o, T2)]
                + jax.lax.bitcast_convert_type(out, jnp.uint32))

        # Tier by span (+3 for the c1/c2 lane shifts); the big tier matches
        # the wild-block criterion exactly (span <= SUBWIN - 131).
        span = rel[0, SUB - 1]
        tiers = tuple(t for t in (72, 264) if t < SUBWIN - 128) \
            + (SUBWIN - 128,)
        prev = -1
        for i, T in enumerate(tiers):
            lim = T - 3
            cond = ((span > prev) if i == len(tiers) - 1
                    else (span > prev) & (span <= lim))

            @pl.when(cond)
            def _(T=T):
                place(T)

            prev = lim

    for s in range(BLOCKN // SUB):  # unrolled: traced indices would be i64
        sub_chunk(s * SUB)


def pack_words_pallas(widx, c0, c1, c2, nwords: int,
                      interpret: bool | None = None):
    """words[nwords] with each token's 3 word contributions accumulated.

    widx must be int32 nondecreasing; len(widx) a multiple of BLOCKN; the
    last (_win() + _win1() + 256) words of the buffer must be slack (never
    real stream words) so the final group's window — and any own-window
    block's — stays in bounds.
    """
    if interpret is None:
        interpret = INTERPRET
    n0 = widx.shape[0]
    # Pad the token axis to a whole number of KGRP-block groups: padding
    # tokens repeat the last word index (nondecreasing preserved) with
    # all-zero contributions, so they accumulate nothing.
    gtok = KGRP * BLOCKN
    n = -(-n0 // gtok) * gtok
    if n != n0:
        widx = jnp.concatenate(
            [widx, jnp.broadcast_to(widx[-1:], (n - n0,))])
        zpad = jnp.zeros(n - n0, c0.dtype)
        c0, c1, c2 = (jnp.concatenate([c, zpad]) for c in (c0, c1, c2))
    nblk = n // BLOCKN
    nwords_pad = (nwords + 511) // 512 * 512  # lane-aligned HBM width
    ws_al = (widx[::gtok] // 128) * 128  # (ngrp,) aligned window starts

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk // KGRP,),
        in_specs=[
            pl.BlockSpec((1, gtok), lambda g, ws: (0, g)),
            pl.BlockSpec((1, 3 * gtok), lambda g, ws: (0, g)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, _win()), jnp.uint32),
            pltpu.VMEM((1, _win1()), jnp.uint32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    words0 = jnp.zeros((1, nwords_pad), jnp.uint32)
    call = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, nwords_pad), jnp.uint32),
        input_output_aliases={3: 0},  # words_in (after scalar prefetch) -> out
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    c_blk = jnp.stack([c0.reshape(-1, BLOCKN), c1.reshape(-1, BLOCKN),
                       c2.reshape(-1, BLOCKN)], axis=1).reshape(1, 3 * n)
    # Trace the kernel with x64 disabled: under x64 Mosaic fails to
    # legalize (64-bit index/literal types leak into the kernel jaxpr).
    with jax.enable_x64(False):
        out = call(ws_al.astype(jnp.int32), widx.reshape(1, n), c_blk, words0)
    return out.reshape(nwords_pad)[:nwords]
