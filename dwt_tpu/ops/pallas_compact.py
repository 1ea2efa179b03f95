"""Pallas TPU kernels: bitplane compaction via MXU one-hot matmuls.

The encoder's two remaining scatter bottlenecks (round-1 profile: ~2.1 s
refinement bits + ~0.9 s significance/sign token placement of a 4.7 s 4K
encode, vs XLA scatter's ~8 ns/element) share one structure: per
(channel, level-segment, plane) schedule step, a masked subset of
coefficients emits values at *consecutive* ranks — a stream compaction.
XLA cannot see the monotone/dense structure; these kernels exploit it the
same way ops/pallas_pack.py does for codeword packing:

* The grid is a flat list of **units** — (schedule step, 64K-element chunk
  of the step's segment) in stream-position order — so each unit's outputs
  land in one small window and consecutive units' windows overlap only at
  boundaries, which the sequential TPU grid makes safe to read-modify-write
  via DMA.
* Per-unit metadata (element span, plane, output base, carried ranks) is
  computed in XLA (dwt_tpu/codec/encoder.py builds it from the per-chunk
  plane histograms of stage 1) and scalar-prefetched.
* The packed elements arrive as a 2-D (rows, 1024) array (row width ==
  encoder.ALIGN / 8, so units start on whole 8-row sublane tiles — Mosaic
  needs dim-0 slice offsets divisible by the tiling).  A unit's masks and local
  ranks are computed for ALL of its rows in one (64, 1024) vector pass —
  lane-axis prefix sums by log-step shifted adds (Mosaic has no cumsum
  primitive), cross-row rank carries by a strictly-lower-triangular f32
  matmul on the MXU.  A per-row loop then only *places*: values compact
  into the output window with a one-hot (window-position == target) int8
  matrix contracted against the nibble planes of the values on the MXU
  (s8 x s8 -> s32 is exact; each window slot receives exactly one value).
  Empty rows skip with two reductions; row-count tiers keep the one-hot
  small for the common sparse case.

Kernel A (`compact_tokens_pallas`) places significance-run/sign token
*values*: the j-th newly-significant coefficient of a step owns token
slots base+2j (its zero-count prefix, later turned into the run length by
a dense diff) and base+2j+1 (its sign).  Because the two tokens of a pair
are derivable from one 31-bit value ((zpfx << 1) | sign) and step bases
are even (pack-block aligned), the kernel works in *pair space*: one
placement per significant element at consecutive pair ranks — half the
lanes and half the target span of placing both tokens — and the encoder
expands pairs into the interleaved token array with one dense XLA pass.
Reference semantics being reproduced: encode.c:70-83 significance pass.

Kernel B (`scatter_refbits_pallas`) ORs refinement bits directly into the
final stream words: the j-th still-refined coefficient of a step owns bit
refstart+j (raw bits, no coder state — encode.c:84-93).  It runs after the
codeword packer and read-modify-writes the same words buffer, so boundary
words shared with token bits merge by addition of disjoint bits.

Mosaic notes (see also ops/pallas_pack.py): 2-D values with the work axis
in lanes; refs + pl.ds only; trace with x64 disabled; u32->s8 via s32;
scalar stores to VMEM are (1, 1) vector stores; no cumsum primitive;
scalar reductions must go through a (1,)-shaped axis reduction + [0]
extraction — Mosaic lowers reduce-to-scalar via a proxy re-trace of
jnp.sum under the AMBIENT config, which promotes i32 sums to i64 when the
embedding application enables x64.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default for the wrappers' interpret= (tests force-run the kernels on CPU
# by flipping this plus the size constants; see tests/test_pallas_compact.py).
INTERPRET = False

# Elements per unit chunk.  Metadata arrays are O(total/E * PMAX) — at 64K
# they stay a few thousand entries (SMEM-friendly scalar prefetch).
E = 65536
# Elements per kernel sub-chunk == one row of the 2-D packed-element array
# (and of the encoder's lane-aligned segment layout, encoder.ALIGN): both
# kernels classify and rank ALL rows of a unit in a handful of (rows, SUB)
# vector ops — cross-row rank carries come from a lower-triangular MXU
# matmul — and then loop rows only to place, skipping empty ones with two
# cheap reductions.  The old (1, 512)-per-iteration form spent most of its
# time re-running the mask pipeline at 1/8 VPU occupancy.
SUBA = 1024   # kernel-A row width (token targets span 2*SUBA per row)
SUBB = 1024   # kernel-B row width (bit targets span 32 words + misalign)
# Lane alignment of dynamic sub-window bases inside VMEM scratch: Mosaic
# requires dynamic vector load/store offsets to be 128-lane aligned.
SUBAL = 128

# Kernel A pair windows (int32 pair slots; a pair = (zpfx, sign) encoded
# as (zpfx << 1) | sign, expanded to two token slots outside the kernel).
WTOK_SMALL = 4096
WTOK_BIG = E + 256
# Kernel A placement tiers.  Every row's targets are CONSECUTIVE ranks, so
# sparse rows use the two-matmul split placement (_place_split: compact to
# rank-relative positions with a (t, SUBA) one-hot, then shift-merge the
# dense result with a (_r2(t), t) one-hot — construct cost
# t*(SUBA + _r2(t)) instead of (t + SUBAL)*SUBA); dense rows keep the
# direct one-hot, which is cheaper once t^2 rivals SUBAL*SUBA.
ASPLIT = (4, 16, 64, 128, 256)   # split tiers: cover cnt <= t
# Direct tiers cover cnt <= rows - SUBAL.  Rows must be SUBAL multiples:
# the window-tail clamp base = min(floor128(base0), window - rows) is only
# 128-lane aligned — a Mosaic requirement the kernel PROMISES via
# pl.multiple_of — when (window - rows) is itself a multiple of 128.  A
# misaligned promise is not caught by interpret mode and corrupts the
# window tail on hardware (the round-2 4K bench failure).
ADIRECT = (640, SUBA + SUBAL)
# Kernel B stream-word window; every row's refinement bits are consecutive,
# touching <= SUBB/32 + 1 words, so B always uses the split placement.
# Sparse rows (cnt bits spanning <= t words for a BSPLIT tier t) take a
# smaller first one-hot: deep planes classify most elements as refined so
# their rows are dense, but near planes_max the per-row counts drop and
# the fixed B1ROWS construct (rows x SUBB lane-ops) dominated them.
WREF = E // 32 + 256
BSPLIT = (8, 16)  # sparse tiers: t rows cover cnt <= 32t - 31 bits
B1ROWS = SUBB // 32 + 8


def _r2(r1: int) -> int:
    """Shift-merge window rows for a split placement of span <= r1: r1 for
    the data + SUBAL for the base misalignment, rounded UP to a SUBAL
    multiple so the window-tail clamp (limit - r2) stays 128-lane aligned
    (see ADIRECT comment; limits are SUBAL multiples)."""
    return -(-(r1 + SUBAL + 8) // SUBAL) * SUBAL

# Per-unit metadata columns (kernel A / kernel B share the layout).
#   0: element start (flat, 512-aligned)   1: valid element count
#   2: plane                               3: window start (tokens / words)
#   4: local output base (tokens from window start / BITS from window bit 0)
#   5: zpfx carry (A) or unused (B)        6: emit count (0 = skip unit)
MCOLS = 8


# Lane-axis rank prefix sums ride the MXU (one s8 matmul against a
# strictly-triangular constant held in persistent scratch) instead of
# log2(SUB) shifted adds on the VPU — the adds were the kernels' largest
# remaining per-plane classification cost.  DWT_NO_MXURANK=1 falls back.
MXU_RANKS = os.environ.get("DWT_NO_MXURANK") != "1"


def _excl_lanes(m, n):
    """Exclusive prefix sum along the lane axis of (rows, n) int32."""
    x = m
    k = 1
    while k < n:
        x = x + jnp.concatenate(
            [jnp.zeros((x.shape[0], k), x.dtype), x[:, :-k]], axis=1)
        k *= 2
    return x - m


def _tri_init(tri_scr, n):
    """Fill the (n, n) s8 strictly-lower-from-the-left matrix
    tri[j, i] = (j < i); m @ tri is the exclusive lane prefix sum."""
    tri_scr[:, :] = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(jnp.int8)


def _excl_lanes_mxu(masks_s8, tri_scr):
    """(rows, n) s8 0/1 masks -> (rows, n) int32 exclusive lane prefix
    sums, as one s8 x s8 -> s32 MXU contraction (exact: counts < 2^15)."""
    return jax.lax.dot_general(
        masks_s8, tri_scr[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _excl_rows(col):
    """Exclusive prefix sum down the rows of a (R, 1) int32 column, via
    log-step shifted adds along the sublane axis.  (A lower-triangular f32
    MXU matmul is NOT exact here: Mosaic lowers f32 dots through a single
    bf16 pass, which rounds integer sums beyond 2^8 — measured on v5e.)"""
    R = col.shape[0]
    x = col
    k = 1
    while k < R:
        x = x + jnp.concatenate(
            [jnp.zeros((k, 1), x.dtype), x[:-k, :]], axis=0)
        k *= 2
    return x - col


def _nibbles(vals):
    """(1, n) uint32 -> (8, n) int8 nibble planes (positive in s8)."""
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (8, 1), 0) * 4
    return ((vals >> shifts) & jnp.uint32(0xF)).astype(jnp.int32).astype(jnp.int8)


def _onehot_place(scratch, base, rows, tgt, vals, bitcast):
    """scratch[0, base:base+rows] += sum_t (tgt_t == base+w) * vals_t.

    tgt/vals: (1, n) int32 targets (−1 = no-op) and uint32 values.  The
    one-hot contraction runs on the MXU; nibble-plane partial sums
    recombine with shifted adds (s32 overflow is mod 2^32, as required for
    kernel B's bit accumulation; kernel A values are < 2^31 so the same
    path is exact there too).
    """
    n = tgt.shape[1]
    # Callers must pass a TRUE SUBAL-multiple base (clamps against aligned
    # window - rows values): pl.multiple_of is a promise, not a check — a
    # false promise corrupts the store on hardware while passing interpret
    # mode (the round-2 4K bench failure).
    assert rows % SUBAL == 0, rows
    base = pl.multiple_of(base, SUBAL)
    rel = tgt - base
    oh = (jax.lax.broadcasted_iota(jnp.int32, (rows, n), 0) == rel).astype(jnp.int8)
    acc = jax.lax.dot_general(
        _nibbles(vals), oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)  # (8, rows)
    rshift = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) * 4
    out = jnp.sum(acc << rshift, axis=0, keepdims=True, dtype=jnp.int32)
    if bitcast:
        out = jax.lax.bitcast_convert_type(out, jnp.uint32)
    scratch[:, pl.ds(base, rows)] = scratch[:, pl.ds(base, rows)] + out


def _place_split(scratch, base0, r1, r2, tgt, vals, bitcast, limit):
    """Two-matmul placement for a row whose targets are the CONSECUTIVE
    positions [base0, base0 + span) with span <= r1: compact values to
    target-relative ranks with a (r1, n) one-hot, then shift-merge the
    dense (8, r1) nibble planes into the window with a (r2, r1) one-hot.
    The intermediate nibble sums are < 16, so the s8 second matmul is
    exact.  r2 must cover r1 + SUBAL misalignment AND be a SUBAL multiple
    (use _r2(r1)): limits are SUBAL multiples, so the window-tail clamp
    below stays truly 128-aligned — pl.multiple_of on a misaligned value
    corrupts the store on hardware while passing interpret mode (the
    round-2 4K bench failure: unit windows whose tail rows clamped against
    the unaligned limit - (r1 + SUBAL + 8))."""
    n = tgt.shape[1]
    assert r2 % SUBAL == 0 and limit % SUBAL == 0, (r1, r2, limit)
    rel = jnp.where(tgt >= 0, tgt - base0, -1)
    oh1 = (jax.lax.broadcasted_iota(jnp.int32, (r1, n), 0)
           == rel).astype(jnp.int8)
    acc = jax.lax.dot_general(
        _nibbles(vals), oh1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)  # (8, r1)
    base = jnp.minimum((base0 // SUBAL) * SUBAL, limit - r2)
    delta = base0 - base
    oh2 = (jax.lax.broadcasted_iota(jnp.int32, (r2, r1), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (r2, r1), 1) + delta
           ).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        acc.astype(jnp.int8), oh2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)  # (8, r2)
    rshift = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) * 4
    out = jnp.sum(acc2 << rshift, axis=0, keepdims=True, dtype=jnp.int32)
    if bitcast:
        out = jax.lax.bitcast_convert_type(out, jnp.uint32)
    base = pl.multiple_of(base, SUBAL)
    scratch[:, pl.ds(base, r2)] = scratch[:, pl.ds(base, r2)] + out


MAGMASK = (1 << 30) - 1  # bits 0..29 hold |coeff| (< 2^29); bit 30 = sign


def _masks2d(v, p, u_len):
    """Element classification for plane p from the (R, SUB) packed
    sign|mag rows of one unit.

    v < 0 marks invalid (segment padding); beyond u_len lies the next
    segment's data.  (mag >> p): 0 -> zero-run member, 1 -> newly
    significant, >1 -> refined.
    """
    R, n = v.shape
    gidx = (jax.lax.broadcasted_iota(jnp.int32, (R, n), 0) * n
            + jax.lax.broadcasted_iota(jnp.int32, (R, n), 1))
    ok = (v >= 0) & (gidx < u_len)
    mag = v & MAGMASK
    sh = jax.lax.shift_right_logical(mag, p)
    return ok, mag, sh


# ---------------------------------------------------------------------------
# Kernel A: significance-token compaction
# ---------------------------------------------------------------------------

def _a_kernel(meta_ref, vmag, tok_in, tok_out, elbuf, tgtbuf, valbuf,
              colbuf, win_s, win_b, tri, sem_el, sem_in, sem_out):
    del tok_in  # aliased with tok_out
    b = pl.program_id(0)
    nsig = meta_ref[8 * b + 6]
    RA = E // SUBA

    if MXU_RANKS:
        # Persistent scratch: built once at grid step 0, reused by every
        # later unit (the TPU grid is sequential; interpret mode matches).
        @pl.when(b == 0)
        def _():
            _tri_init(tri, SUBA)

    @pl.when(nsig > 0)
    def _():
        # Unit's first row of the 2-D elements: encoder.ALIGN == 8 * SUBA
        # makes every unit start on an 8-row sublane tile, which Mosaic
        # requires for dynamic dim-0 memref slicing.
        row0 = pl.multiple_of(meta_ref[8 * b + 0], 8)
        cp_el = pltpu.make_async_copy(
            vmag.at[pl.ds(row0, RA), :], elbuf, sem_el)
        cp_el.start()
        cp_el.wait()
        ws = pl.multiple_of(meta_ref[8 * b + 3], 128)

        # Whole-unit classification + ranks in one 2-D pass.
        v = elbuf[:, :]
        ok, _, sh = _masks2d(v, meta_ref[8 * b + 2], meta_ref[8 * b + 1])
        mS = ok & (sh == 1)
        mZ = ok & (sh == 0)
        mSi = mS.astype(jnp.int32)
        if MXU_RANKS:
            both = _excl_lanes_mxu(jnp.concatenate(
                [mS.astype(jnp.int8), mZ.astype(jnp.int8)], axis=0), tri)
            sex, zex = both[:RA, :], both[RA:, :]
        else:
            sex = _excl_lanes(mSi, SUBA)
            zex = _excl_lanes(mZ.astype(jnp.int32), SUBA)
        cnt_r = jnp.sum(mSi, axis=1, keepdims=True, dtype=jnp.int32)
        z_r = jnp.sum(mZ, axis=1, keepdims=True, dtype=jnp.int32)
        scum = _excl_rows(cnt_r)
        zcum = meta_ref[8 * b + 5] + _excl_rows(z_r)
        zpfx = zcum + zex
        sgn = (v >> 30) & 1
        loc = meta_ref[8 * b + 4] + scum + sex  # pair rank
        tgtbuf[:, :] = jnp.where(mS, loc, -1)
        valbuf[:, :] = jnp.where(mS, (zpfx << 1) | sgn, 0)
        # Per-row placement count and first target, precomputed as columns:
        # ranks are CONSECUTIVE, so a row's min target is just its carry-in
        # (meta4 + scum) — the placement loop below reads these instead of
        # re-deriving them with a cross-lane min/sum per row (two serialized
        # reductions x rows x units dominated the kernel's runtime).
        RApad = cnt_r.shape[0]
        colbuf[:, :] = jnp.concatenate(
            [cnt_r, meta_ref[8 * b + 4] + scum,
             jnp.zeros((RApad, SUBAL - 2), jnp.int32)], axis=1)

        def run(win, wtok):
            cp_in = pltpu.make_async_copy(
                tok_out.at[:, pl.ds(ws, wtok)], win, sem_in)
            cp_in.start()
            cp_in.wait()

            # Dynamic sublane offsets must be 8-row aligned: walk 8-row
            # superblocks (skipping empty ones), statically unrolling the
            # single-row placements inside each.
            SB = min(8, RA)

            def sub(sb, c):
                r0 = pl.multiple_of(sb * SB, SB)
                cblk = colbuf[pl.ds(r0, SB), :]  # (SB, SUBAL) cnt/base cols
                nblk = jnp.sum(cblk[:, 0:1], axis=0)[0]

                @pl.when(nblk > 0)
                def _():
                    tblk = tgtbuf[pl.ds(r0, SB), :]  # (SB, SUBA)
                    vblk = valbuf[pl.ds(r0, SB), :].astype(jnp.uint32)
                    for j in range(SB):
                        tgt = tblk[j:j + 1, :]
                        vals = vblk[j:j + 1, :]
                        n2 = cblk[j, 0]

                        @pl.when(n2 > 0)
                        def _(tgt=tgt, vals=vals, n2=n2):
                            base0 = cblk[j, 1]
                            tiers = ([(t, True) for t in ASPLIT]
                                     + [(t, False) for t in ADIRECT])
                            prev = 0
                            for i, (rows, split) in enumerate(tiers):
                                lim = rows if split else rows - SUBAL
                                cond = ((n2 > prev) if i == len(tiers) - 1
                                        else (n2 > prev) & (n2 <= lim))

                                @pl.when(cond)
                                def _(rows=rows, split=split):
                                    if split:
                                        _place_split(
                                            win, base0, rows, _r2(rows),
                                            tgt, vals, False, wtok)
                                    else:
                                        # wtok - rows is a SUBAL multiple
                                        # (both are), so base stays truly
                                        # 128-aligned when clamped.
                                        assert (wtok - rows) % SUBAL == 0
                                        base = jnp.minimum(
                                            (base0 // SUBAL) * SUBAL,
                                            wtok - rows)
                                        _onehot_place(win, base, rows, tgt,
                                                      vals, False)

                                prev = lim

                return c

            jax.lax.fori_loop(0, RA // SB, sub, jnp.int32(0))
            cp_out = pltpu.make_async_copy(
                win, tok_out.at[:, pl.ds(ws, wtok)], sem_out)
            cp_out.start()
            cp_out.wait()

        @pl.when(nsig <= WTOK_SMALL - 192)
        def _():
            run(win_s, WTOK_SMALL)

        @pl.when(nsig > WTOK_SMALL - 192)
        def _():
            run(win_b, WTOK_BIG)


def compact_tokens_pallas(vmag, meta, tok0, interpret: bool | None = None):
    """Accumulate significance-token PAIR values ((zpfx << 1) | sign, one
    per newly-significant element) into the (1, PBUF) int32 pair buffer.
    ``vmag``: (NR, SUBA) packed sign|mag element rows; ``meta``: (U, 8)
    int32 per-unit metadata in stream order (col 0 = first element row,
    cols 3/4 in pair slots); ``tok0``: zero-initialized pair buffer
    including >= WTOK_BIG + 128 slack beyond the last real pair.
    """
    if interpret is None:
        interpret = INTERPRET
    U = meta.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(U,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((E // SUBA, SUBA), jnp.int32),
            pltpu.VMEM((E // SUBA, SUBA), jnp.int32),
            pltpu.VMEM((E // SUBA, SUBA), jnp.int32),
            pltpu.VMEM((E // SUBA, SUBAL), jnp.int32),
            pltpu.VMEM((1, WTOK_SMALL), jnp.int32),
            pltpu.VMEM((1, WTOK_BIG), jnp.int32),
            pltpu.VMEM((SUBA, SUBA), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        _a_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(tok0.shape, jnp.int32),
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    # Scalar prefetch must be 1-D: Mosaic pads the minor axis of 2-D SMEM
    # arrays to 128 lanes, inflating (U, 8) 16x past the 1 MB SMEM budget
    # at production unit counts.
    with jax.enable_x64(False):
        return call(meta.reshape(-1), vmag, tok0)


# ---------------------------------------------------------------------------
# Kernel B: refinement bits -> final stream words
# ---------------------------------------------------------------------------

def _b_kernel(meta_ref, vmag, words_in, words_out, elbuf, tgtbuf, valbuf,
              colbuf, win, tri, sem_el, sem_in, sem_out):
    del words_in
    b = pl.program_id(0)
    RB = E // SUBB

    if MXU_RANKS:
        @pl.when(b == 0)
        def _():
            _tri_init(tri, SUBB)

    @pl.when(meta_ref[8 * b + 6] > 0)
    def _():
        row0 = pl.multiple_of(meta_ref[8 * b + 0], 8)  # see _a_kernel
        cp_el = pltpu.make_async_copy(
            vmag.at[pl.ds(row0, RB), :], elbuf, sem_el)
        cp_el.start()
        cp_el.wait()
        ws = pl.multiple_of(meta_ref[8 * b + 3], 128)
        cp_in = pltpu.make_async_copy(
            words_out.at[:, pl.ds(ws, WREF)], win, sem_in)
        cp_in.start()
        cp_in.wait()

        # Whole-unit classification + bit positions in one 2-D pass.
        v = elbuf[:, :]
        ok, _, sh = _masks2d(v, meta_ref[8 * b + 2], meta_ref[8 * b + 1])
        mR = ok & (sh > 1)
        mRi = mR.astype(jnp.int32)
        if MXU_RANKS:
            rex = _excl_lanes_mxu(mR.astype(jnp.int8), tri)
        else:
            rex = _excl_lanes(mRi, SUBB)
        r_r = jnp.sum(mRi, axis=1, keepdims=True, dtype=jnp.int32)
        rcum = _excl_rows(r_r)
        bitpos = meta_ref[8 * b + 4] + rcum + rex  # window-local bits
        bit = sh.astype(jnp.uint32) & 1
        valbuf[:, :] = jnp.where(
            mR, bit << (bitpos & 31).astype(jnp.uint32), 0)
        tgtbuf[:, :] = jnp.where(mR, bitpos >> 5, -1)
        # Precomputed per-row columns (see _a_kernel): cnt, first-word.
        # Bit positions are consecutive, so a row's min target word is its
        # carry-in bit position >> 5 — no per-row cross-lane min needed.
        RBpad = r_r.shape[0]
        colbuf[:, :] = jnp.concatenate(
            [r_r, (meta_ref[8 * b + 4] + rcum) >> 5,
             jnp.zeros((RBpad, SUBAL - 2), jnp.int32)], axis=1)

        SB = min(8, RB)

        def sub(sb, c):
            r0 = pl.multiple_of(sb * SB, SB)
            cblk = colbuf[pl.ds(r0, SB), :]  # (SB, SUBAL) cnt/word cols
            nblk = jnp.sum(cblk[:, 0:1], axis=0)[0]

            @pl.when(nblk > 0)
            def _():
                tblk = tgtbuf[pl.ds(r0, SB), :]  # (SB, SUBB)
                vblk = valbuf[pl.ds(r0, SB), :]
                for j in range(SB):
                    tgt = tblk[j:j + 1, :]
                    vals = vblk[j:j + 1, :]
                    cnt = cblk[j, 0]

                    @pl.when(cnt > 0)
                    def _(tgt=tgt, vals=vals, cnt=cnt):
                        base0 = cblk[j, 1]
                        # Tier by bit count: t rows hold any run of
                        # <= 32t - 31 bits (worst-case word misalignment).
                        tiers = tuple(t for t in BSPLIT if t < B1ROWS) \
                            + (B1ROWS,)
                        prev = 0
                        for i, t in enumerate(tiers):
                            lim = 32 * t - 31
                            cond = ((cnt > prev) if i == len(tiers) - 1
                                    else (cnt > prev) & (cnt <= lim))

                            @pl.when(cond)
                            def _(t=t, base0=base0):
                                _place_split(win, base0, t, _r2(t),
                                             tgt, vals, True, WREF)

                            prev = lim

            return c

        jax.lax.fori_loop(0, RB // SB, sub, jnp.int32(0))
        cp_out = pltpu.make_async_copy(
            win, words_out.at[:, pl.ds(ws, WREF)], sem_out)
        cp_out.start()
        cp_out.wait()


def scatter_refbits_pallas(vmag, meta, words, interpret: bool | None = None):
    """OR every refinement bit into the packed stream words at its final
    position.  ``vmag``: (NR, SUBB) packed element rows; ``words``:
    (1, nwords) uint32 (already holding the compact token codewords);
    metadata column 4 carries u_bit0 - 32 * window_start.
    """
    if interpret is None:
        interpret = INTERPRET
    U = meta.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(U,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((E // SUBB, SUBB), jnp.int32),
            pltpu.VMEM((E // SUBB, SUBB), jnp.int32),
            pltpu.VMEM((E // SUBB, SUBB), jnp.uint32),
            pltpu.VMEM((E // SUBB, SUBAL), jnp.int32),
            pltpu.VMEM((1, WREF), jnp.uint32),
            pltpu.VMEM((SUBB, SUBB), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        _b_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(words.shape, jnp.uint32),
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    with jax.enable_x64(False):
        return call(meta.reshape(-1), vmag, words)
