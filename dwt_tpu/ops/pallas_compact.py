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
* Within a unit, 512/1024-element sub-chunks compute masks and local ranks
  with log-step shifted-add prefix sums (Mosaic has no cumsum primitive),
  then compact values into the window with a one-hot (window-position ==
  target) int8 matrix contracted against the nibble planes of the values on
  the MXU (s8 x s8 -> s32 is exact; each window slot receives exactly one
  value).  Row-count tiers keep the one-hot small for the common sparse
  case.

Kernel A (`compact_tokens_pallas`) places significance-run/sign token
*values* into the dense token array: the j-th newly-significant coefficient
of a step owns token slots base+2j (its zero-count prefix, later turned
into the run length by a dense diff) and base+2j+1 (its sign).  Reference
semantics being reproduced: encode.c:70-83 significance pass.

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
SUBA = 1024   # elements per kernel-A sub-chunk (token targets span 2*SUBA)
SUBB = 2048   # elements per kernel-B sub-chunk (bit targets span 64 words)
# Lane alignment of dynamic sub-window bases inside VMEM scratch: Mosaic
# requires dynamic vector load/store offsets to be 128-lane aligned.
SUBAL = 128

# Kernel A token windows (int32 token slots).
WTOK_SMALL = 8192
WTOK_BIG = 2 * E + 256
# Kernel A one-hot row tiers (target span 2*cnt + SUBAL misalignment).
ATIERS = (256, 640, 1408, 2 * SUBA + SUBAL + 128)
# Kernel B stream-word window and one-hot rows (<= 33 words + misalign).
WREF = E // 32 + 256
BROWS = SUBB // 32 + SUBAL + 32

# Per-unit metadata columns (kernel A / kernel B share the layout).
#   0: element start (flat, 512-aligned)   1: valid element count
#   2: plane                               3: window start (tokens / words)
#   4: local output base (tokens from window start / BITS from window bit 0)
#   5: zpfx carry (A) or unused (B)        6: emit count (0 = skip unit)
MCOLS = 8


def _excl_lanes(m, n):
    """Exclusive prefix sum along the lane axis of (1, n) int32."""
    x = m
    k = 1
    while k < n:
        x = x + jnp.concatenate(
            [jnp.zeros((1, k), x.dtype), x[:, :-k]], axis=1)
        k *= 2
    return x - m


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


MAGMASK = (1 << 30) - 1  # bits 0..29 hold |coeff| (< 2^29); bit 30 = sign


def _masks(v, p, lane0, u_len):
    """Element classification for plane p from the packed sign|mag input.

    v < 0 marks invalid (segment padding); beyond u_len lies the next
    segment's data.  (mag >> p): 0 -> zero-run member, 1 -> newly
    significant, >1 -> refined.
    """
    n = v.shape[1]
    inlen = (lane0 + jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)) < u_len
    ok = (v >= 0) & inlen
    mag = v & MAGMASK
    sh = jax.lax.shift_right_logical(mag, p)
    return ok, mag, sh


# ---------------------------------------------------------------------------
# Kernel A: significance-token compaction
# ---------------------------------------------------------------------------

def _a_kernel(meta_ref, vmag, tok_in, tok_out, elbuf, win_s, win_b,
              sem_el, sem_in, sem_out):
    del tok_in  # aliased with tok_out
    b = pl.program_id(0)
    nsig = meta_ref[8 * b + 6]

    @pl.when(nsig > 0)
    def _():
        el0 = pl.multiple_of(meta_ref[8 * b + 0], 512)
        cp_el = pltpu.make_async_copy(
            vmag.at[:, pl.ds(el0, E)], elbuf, sem_el)
        cp_el.start()
        cp_el.wait()
        ws = pl.multiple_of(meta_ref[8 * b + 3], 128)

        def run(win, wtok):
            cp_in = pltpu.make_async_copy(
                tok_out.at[:, pl.ds(ws, wtok)], win, sem_in)
            cp_in.start()
            cp_in.wait()

            def sub(s, carry):
                zcum, scum = carry
                v = elbuf[:, pl.ds(s * SUBA, SUBA)]
                ok, mag, sh = _masks(v, meta_ref[8 * b + 2],
                                     s * SUBA, meta_ref[8 * b + 1])
                mS = ok & (sh == 1)
                mZ = ok & (sh == 0)
                mSi = mS.astype(jnp.int32)
                cnt = jnp.sum(mSi, axis=1, dtype=jnp.int32)[0]

                @pl.when(cnt > 0)
                def _():
                    sex = _excl_lanes(mSi, SUBA)
                    zpfx = zcum + _excl_lanes(mZ.astype(jnp.int32), SUBA)
                    sgn = (v >> 30) & 1
                    loc = meta_ref[8 * b + 4] + 2 * (scum + sex)  # even slots
                    tgt = jnp.concatenate(
                        [jnp.where(mS, loc, -1), jnp.where(mS, loc + 1, -1)],
                        axis=1)
                    vals = jnp.concatenate(
                        [jnp.where(mS, zpfx, 0), jnp.where(mS, sgn, 0)],
                        axis=1).astype(jnp.uint32)
                    base0 = meta_ref[8 * b + 4] + 2 * scum
                    for i, rows in enumerate(ATIERS):
                        lim = (rows - SUBAL) // 2
                        lo = 0 if i == 0 else (ATIERS[i - 1] - SUBAL) // 2
                        cond = cnt <= lim if i < len(ATIERS) - 1 else cnt > lo

                        @pl.when(cond if i == len(ATIERS) - 1
                                 else (cnt > lo) & (cnt <= lim))
                        def _(rows=rows):
                            base = jnp.minimum(
                                (base0 // SUBAL) * SUBAL, wtok - rows)
                            _onehot_place(win, base, rows, tgt, vals, False)

                return (zcum + jnp.sum(mZ, axis=1, dtype=jnp.int32)[0],
                            scum + cnt)

            jax.lax.fori_loop(0, E // SUBA, sub, (meta_ref[8 * b + 5], jnp.int32(0)))
            cp_out = pltpu.make_async_copy(
                win, tok_out.at[:, pl.ds(ws, wtok)], sem_out)
            cp_out.start()
            cp_out.wait()

        @pl.when(2 * nsig <= WTOK_SMALL - 192)
        def _():
            run(win_s, WTOK_SMALL)

        @pl.when(2 * nsig > WTOK_SMALL - 192)
        def _():
            run(win_b, WTOK_BIG)


def compact_tokens_pallas(vmag, meta, tok0, interpret: bool | None = None):
    """Accumulate significance-token values into the (1, TBUF) int32 token
    buffer.  ``vmag``: (1, NE) packed sign|mag elements; ``meta``: (U, 8)
    int32 per-unit metadata in stream order; ``tok0``: zero-initialized
    buffer including >= WTOK_BIG + 128 slack beyond the last real token.
    """
    if interpret is None:
        interpret = INTERPRET
    U = meta.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(U,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, E), jnp.int32),
            pltpu.VMEM((1, WTOK_SMALL), jnp.int32),
            pltpu.VMEM((1, WTOK_BIG), jnp.int32),
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

def _b_kernel(meta_ref, vmag, words_in, words_out, elbuf, win,
              sem_el, sem_in, sem_out):
    del words_in
    b = pl.program_id(0)

    @pl.when(meta_ref[8 * b + 6] > 0)
    def _():
        el0 = pl.multiple_of(meta_ref[8 * b + 0], 512)
        cp_el = pltpu.make_async_copy(
            vmag.at[:, pl.ds(el0, E)], elbuf, sem_el)
        cp_el.start()
        cp_el.wait()
        ws = pl.multiple_of(meta_ref[8 * b + 3], 128)
        cp_in = pltpu.make_async_copy(
            words_out.at[:, pl.ds(ws, WREF)], win, sem_in)
        cp_in.start()
        cp_in.wait()

        def sub(s, rcum):
            v = elbuf[:, pl.ds(s * SUBB, SUBB)]
            ok, mag, sh = _masks(v, meta_ref[8 * b + 2], s * SUBB, meta_ref[8 * b + 1])
            mR = ok & (sh > 1)
            mRi = mR.astype(jnp.int32)
            cnt = jnp.sum(mRi, axis=1, dtype=jnp.int32)[0]

            @pl.when(cnt > 0)
            def _():
                rex = _excl_lanes(mRi, SUBB)
                bitpos = meta_ref[8 * b + 4] + rcum + rex  # window-local bits
                bit = jax.lax.shift_right_logical(
                    mag, meta_ref[8 * b + 2]).astype(jnp.uint32) & 1
                val = jnp.where(
                    mR, bit << (bitpos & 31).astype(jnp.uint32), 0)
                tgt = jnp.where(mR, bitpos >> 5, -1)
                base = jnp.minimum(
                    ((meta_ref[8 * b + 4] + rcum) >> 5) // SUBAL * SUBAL,
                    WREF - BROWS)
                _onehot_place(win, base, BROWS, tgt, val, True)

            return rcum + cnt

        jax.lax.fori_loop(0, E // SUBB, sub, jnp.int32(0))
        cp_out = pltpu.make_async_copy(
            win, words_out.at[:, pl.ds(ws, WREF)], sem_out)
        cp_out.start()
        cp_out.wait()


def scatter_refbits_pallas(vmag, meta, words, interpret: bool | None = None):
    """OR every refinement bit into the packed stream words at its final
    position.  ``words``: (1, nwords) uint32 (already holding the compact
    token codewords); metadata column 4 carries u_bit0 - 32 * window_start.
    """
    if interpret is None:
        interpret = INTERPRET
    U = meta.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(U,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, E), jnp.int32),
            pltpu.VMEM((1, WREF), jnp.uint32),
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
