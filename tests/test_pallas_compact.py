"""CPU coverage for the Pallas compaction kernels (interpret mode).

The production path only runs on TPU; here the kernels execute through the
Pallas interpreter with shrunken unit/window sizes, and the full stage-2
pipeline must produce byte-identical streams vs the XLA fallback (which is
itself byte-identical to the sequential spec model / reference encoder).
"""

import numpy as np
import pytest

from imagegen import random_image


@pytest.fixture
def small_kernels(monkeypatch):
    """Shrink kernel unit/window sizes so interpret mode stays fast."""
    from dwt_tpu.ops import pallas_compact as pc
    from dwt_tpu.ops import pallas_pack as pp

    monkeypatch.setattr(pc, "E", 2048)
    # Pair windows must stay >= the largest direct-tier row count.
    monkeypatch.setattr(pc, "WTOK_SMALL", max(2048, pc.ADIRECT[-1]))
    monkeypatch.setattr(pc, "WTOK_BIG", 2048 + pc.ADIRECT[-1] + 128)
    # WREF must stay a SUBAL multiple (the kernels' aligned window-clamp
    # invariant, asserted in _place_split).
    monkeypatch.setattr(pc, "WREF", 2048 // 32 + 448)
    monkeypatch.setattr(pc, "INTERPRET", True)
    from dwt_tpu.ops import pallas_hilbert as ph
    from dwt_tpu.ops import pallas_transpose as pt

    monkeypatch.setattr(pt, "INTERPRET", True)
    monkeypatch.setattr(ph, "INTERPRET", True)
    # Small pack blocks keep the per-step base padding (and interpret-mode
    # runtime) proportionate on tiny test images.
    monkeypatch.setattr(pp, "BLOCKN", 256)
    monkeypatch.setattr(pp, "SUB", 64)
    monkeypatch.setattr(pp, "SUBSMALL", 128)
    monkeypatch.setattr(pp, "SUBWIN", 256)
    monkeypatch.setattr(pp, "INTERPRET", True)
    yield


@pytest.mark.parametrize("kind", ["noise", "mixed", "checker"])
def test_stage2_kernels_byte_identical(small_kernels, monkeypatch, kind):
    from dwt_tpu import specmodel
    from dwt_tpu.codec import encoder

    rng = np.random.default_rng(11)
    if kind == "checker":
        # Alternating 0/255 columns: one dominant bitplane saturates rows
        # through kernel B's dense tier (and kernel A's direct tiers);
        # high planes drive its sparse tier.
        img = np.zeros((96, 128, 3), np.uint8)
        img[:, ::2] = 255
        w, h = 128, 96
    else:
        img = random_image(rng, 64, 48, 3, kind)
        w, h = 64, 48

    monkeypatch.setattr(encoder, "_use_pallas", lambda: True)
    monkeypatch.setattr(encoder, "_use_pallas_pack", lambda t: True)
    enc = encoder.Encoder(w, h, 3)
    got = enc.encode(img)

    want = specmodel.encode(img, gray=False)
    assert got == want


@pytest.mark.parametrize("carry", [0, 7])
@pytest.mark.parametrize("big", [False, True])
def test_kernel_a_tier_boundaries(monkeypatch, big, carry):
    """Direct kernel-A drive with per-row significant counts at the exact
    split/direct tier edges (16/64/128/256 split, 512/1024 direct) plus
    max-magnitude zpfx values — shapes random images never produce."""
    import jax.numpy as jnp

    from dwt_tpu.ops import pallas_compact as pc

    monkeypatch.setattr(pc, "INTERPRET", True)
    rng = np.random.default_rng(5)
    R, N = pc.E // pc.SUBA, pc.SUBA
    cnts = [0, 1, 16, 17, 64, 65, 128, 129, 256, 257, 512, 513, 1023, 1024]
    if big:  # push total nsig past the small-window threshold
        cnts += [1024] * 3 + [512, 300]
    rows = np.zeros((R, N), np.int64)
    for r, c in enumerate(cnts):
        # c significant (mag 1) at random lanes; elsewhere zeros and a few
        # refined (mag >= 2) that kernel A must ignore.
        lanes = rng.permutation(N)
        rows[r, lanes[:c]] = 1
        k = min(17, N - c)
        rows[r, lanes[c : c + k]] = 2 + rng.integers(0, 2**28, k)
    sgn = rng.integers(0, 2, (R, N)).astype(np.int64)
    packed = np.where(rows > 0, rows | (sgn << 30), rows).astype(np.int32)
    elen = R * N - 137  # exercise the tail-invalid mask
    flat = packed.reshape(-1).copy()
    flat[elen:] = -1

    # numpy oracle: pair (zpfx << 1) | sign at u0 + rank for each sig.
    valid = flat >= 0
    mag = flat & pc.MAGMASK
    mS = valid & (mag == 1)
    mZ = valid & (mag == 0)
    zpfx = carry + np.cumsum(mZ) - mZ
    u0 = 64
    want = np.zeros(pc.WTOK_BIG + 512, np.int32)
    ranks = np.cumsum(mS) - mS
    sg = (flat >> 30) & 1
    want[u0 + ranks[mS]] = (zpfx[mS] << 1) | sg[mS]

    meta = jnp.asarray(
        [[0, elen, 0, 0, u0, carry, int(mS.sum()), 0]], jnp.int32)
    tok0 = jnp.zeros((1, pc.WTOK_BIG + 512), jnp.int32)
    got = np.asarray(pc.compact_tokens_pallas(
        jnp.asarray(flat.reshape(R, N)), meta, tok0, interpret=True))[0]
    assert np.array_equal(got, want)


def test_window_clamp_alignment_invariants():
    """Every window-tail clamp value the kernels can produce must be a true
    SUBAL multiple: the kernels promise Mosaic 128-lane-aligned dynamic
    store bases via pl.multiple_of, and a violated promise silently
    corrupts the window tail ON HARDWARE while interpret mode (all CPU
    tests) ignores the hint entirely — the round-2 4K bench failure.
    These are static properties of the production constants; check them
    here so no retuning can reintroduce the bug."""
    from dwt_tpu.ops import pallas_compact as pc
    from dwt_tpu.ops import pallas_pack as pp

    S = pc.SUBAL
    for wtok in (pc.WTOK_SMALL, pc.WTOK_BIG):
        assert wtok % S == 0
        for t in pc.ASPLIT:
            assert pc._r2(t) % S == 0 and pc._r2(t) >= t + S + 8
            assert (wtok - pc._r2(t)) % S == 0
        for rows in pc.ADIRECT:
            assert rows % S == 0 and (wtok - rows) % S == 0
    assert pc.WREF % S == 0
    for t in pc.BSPLIT + (pc.B1ROWS,):
        assert (pc.WREF - pc._r2(t)) % S == 0
    # pack kernel: WIN - ceil128(T + 136) aligned for every span tier and
    # BOTH windows (group and own-window fallback)
    for win in (pp._win(), pp._win1()):
        assert win % 128 == 0
        for T in (72, 264, pp.SUBWIN - 128):
            assert (win - -(-(T + 136) // 128) * 128) % 128 == 0


def test_kernel_b_word_boundaries(monkeypatch):
    """Direct kernel-B drive: refined runs crossing word boundaries at
    every alignment phase, including a full 1024-bit row."""
    import jax.numpy as jnp

    from dwt_tpu.ops import pallas_compact as pc

    monkeypatch.setattr(pc, "INTERPRET", True)
    rng = np.random.default_rng(6)
    R, N = pc.E // pc.SUBB, pc.SUBB
    cnts = [0, 1, 31, 32, 33, 63, 65, 1024, 999, 1]
    rows = np.zeros((R, N), np.int64)
    for r, c in enumerate(cnts):
        lanes = rng.permutation(N)
        rows[r, lanes[:c]] = 4 + 2 * rng.integers(0, 2**26, c)  # refined
        rows[r, lanes[c : c + 9]] = 1  # significant: ignored by kernel B
    packed = rows.astype(np.int32)
    flat = packed.reshape(-1)

    p = 1  # plane: refined are mag >> 1 > 1; emitted bit = (mag >> 1) & 1
    mag = flat & pc.MAGMASK
    mR = (flat >= 0) & ((mag >> p) > 1)
    bit0 = 37  # deliberately word-misaligned
    ranks = np.cumsum(mR) - mR
    want = np.zeros(pc.WREF + 128, np.uint32)
    pos = bit0 + ranks[mR]
    np.add.at(want, pos >> 5,
              (((mag[mR] >> p) & 1) << (pos & 31)).astype(np.uint32))

    meta = jnp.asarray(
        [[0, R * N, p, 0, bit0, 0, int(mR.sum()), 0]], jnp.int32)
    words = jnp.zeros((1, pc.WREF + 128), jnp.uint32)
    got = np.asarray(pc.scatter_refbits_pallas(
        jnp.asarray(flat.reshape(R, N)), meta, words, interpret=True))[0]
    assert np.array_equal(got, want)


@pytest.mark.parametrize("shape,dtype", [
    ((40, 256), "int32"), ((256, 40), "int32"), ((384, 512), "uint32"),
    ((300, 300), "int32"), ((129, 257), "int8"),
])
def test_mxu_transpose(shape, dtype):
    from dwt_tpu.ops.pallas_transpose import transpose2d

    rng = np.random.default_rng(3)
    if dtype == "int8":
        x = rng.integers(-128, 128, shape).astype(np.int8)
    elif dtype == "uint32":
        x = rng.integers(0, 2**32, shape, dtype=np.uint64).astype(np.uint32)
    else:
        x = rng.integers(-2**31, 2**31, shape, dtype=np.int64).astype(np.int32)
    got = np.asarray(transpose2d(x, interpret=True))
    assert np.array_equal(got, x.T.astype(got.dtype))


@pytest.mark.parametrize("wh", [(64, 48), (320, 240), (127, 255)])
def test_hilbert_gather_engine(wh):
    """The Pallas tile-gather engine reproduces the XLA padded-perm gather
    exactly on every valid detail position (root band is the caller's
    raster crop; pads are masked downstream)."""
    import jax.numpy as jnp

    from dwt_tpu.codec.encoder import ALIGN
    from dwt_tpu.geometry import compute_pyramid
    from dwt_tpu.hilbert import padded_layout, tile_plan
    from dwt_tpu.ops.pallas_hilbert import hilbert_gather_pallas

    W, H = wh
    rng = np.random.default_rng(1)
    pyr = compute_pyramid(W, H)
    plan = tile_plan(pyr, ALIGN)
    perm, valid, sizes = padded_layout(pyr, ALIGN)
    co = rng.integers(-2**20, 2**20, (H, W, 3)).astype(np.int32)
    got = np.asarray(hilbert_gather_pallas(
        jnp.asarray(co), plan, perm.shape[0], 3, interpret=True))
    want = co.reshape(-1, 3)[perm].T
    m = valid.copy()
    m[:sizes[0]] = False
    assert np.array_equal(got[:, m], want[:, m])


def test_batch_encoder_pallas_parity(small_kernels, monkeypatch):
    """BatchEncoder vmaps the full pipeline — including the Hilbert gather
    engine and both compaction kernels — over a batch; streams must equal
    the single-image encoder's."""
    from dwt_tpu.codec import encoder, tiled

    monkeypatch.setattr(encoder, "_use_pallas", lambda: True)
    monkeypatch.setattr(encoder, "_use_pallas_pack", lambda t: True)
    rng = np.random.default_rng(12)
    imgs = np.stack([random_image(rng, 64, 48, 3, "mixed") for _ in range(3)])
    be = tiled.BatchEncoder(64, 48, 3)
    got = be.encode_batch(imgs)
    enc = encoder.Encoder(64, 48, 3)
    for i in range(3):
        assert got[i] == enc.encode(imgs[i])


def test_decoder_scatter_engine_roundtrip(small_kernels, monkeypatch):
    """Decode tail with the Pallas inverse-scatter engine: lossless
    roundtrip and equality with the XLA-gather tail, including a
    reduced-resolution decode."""
    from dwt_tpu.codec import decoder, encoder

    monkeypatch.setattr(encoder, "_use_pallas", lambda: True)
    monkeypatch.setattr(encoder, "_use_pallas_pack", lambda t: True)
    rng = np.random.default_rng(13)
    img = random_image(rng, 64, 48, 3, "mixed")
    stream = encoder.Encoder(64, 48, 3).encode(img)
    decoder._tail_fn.cache_clear()
    try:
        out, _ = decoder.decode(stream)
        assert np.array_equal(out, img)
        red, _ = decoder.decode(stream, pixels_max=20 * 16)
        decoder._tail_fn.cache_clear()
        monkeypatch.setattr(encoder, "_use_pallas", lambda: False)
        red_x, _ = decoder.decode(stream, pixels_max=20 * 16)
        assert np.array_equal(red, red_x)
    finally:
        decoder._tail_fn.cache_clear()


def test_hilbert_engines_gray():
    """Both tile engines with C=1 (gray): the channel selector degenerates
    to identity; gather and scatter stay exact."""
    import jax.numpy as jnp

    from dwt_tpu.codec.encoder import ALIGN
    from dwt_tpu.geometry import compute_pyramid
    from dwt_tpu.hilbert import (linearization_perm, padded_layout,
                                 tile_plan)
    from dwt_tpu.ops.pallas_hilbert import (hilbert_gather_pallas,
                                            hilbert_scatter_pallas)

    rng = np.random.default_rng(4)
    W, H = 320, 240
    pyr = compute_pyramid(W, H)
    co = rng.integers(-2**20, 2**20, (H, W, 1)).astype(np.int32)

    plan = tile_plan(pyr, ALIGN)
    perm, valid, sizes = padded_layout(pyr, ALIGN)
    got = np.asarray(hilbert_gather_pallas(
        jnp.asarray(co), plan, perm.shape[0], 1, interpret=True))
    want = co.reshape(-1, 1)[perm].T
    m = valid.copy()
    m[:sizes[0]] = False
    assert np.array_equal(got[:, m], want[:, m])

    plan1 = tile_plan(pyr, 1)
    lperm = linearization_perm(pyr)
    lin = co.reshape(-1, 1)[lperm].T
    back = np.asarray(hilbert_scatter_pallas(
        jnp.asarray(lin), plan1, H, W, 1, interpret=True))
    mask = np.zeros(H * W, bool)
    mask[lperm[pyr.pixels[0]:]] = True
    assert np.array_equal(back.reshape(-1, 1)[mask], co.reshape(-1, 1)[mask])


def test_stage2_kernels_budget_truncated(small_kernels, monkeypatch):
    """Budget-bounded schedule truncation through the REAL kernel path
    (interpret mode): masked-out steps must not write tokens or ref bits,
    and the emitted prefix must equal slicing the full stream."""
    from dwt_tpu.codec import encoder

    rng = np.random.default_rng(23)
    img = random_image(rng, 64, 48, 3, "mixed")
    monkeypatch.setattr(encoder, "_use_pallas", lambda: True)
    monkeypatch.setattr(encoder, "_use_pallas_pack", lambda t: True)
    enc = encoder.Encoder(64, 48, 3)
    full = enc.encode(img)
    for cap in (10, 60, 300, len(full) * 2 // 3):
        got = enc.encode(img, capacity=cap)
        assert got == full[:cap], f"capacity={cap}"


def test_flatten_expand_tiles_roundtrip(monkeypatch):
    """The roll+selector tile flatten (the 2026-08 Mosaic replacement for
    sublane->lane shape casts) must be an exact reshape and an exact
    inverse for full-range int32, at G=8 and G=1."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dwt_tpu.ops import pallas_hilbert as ph

    rng = np.random.default_rng(5)
    for G in (8, 1):
        x = rng.integers(-2**31, 2**31, (G * ph.TS, ph.TS),
                         dtype=np.int64).astype(np.int32)

        def kf(x_ref, o_ref, G=G):
            o_ref[:, :] = ph._flatten_tiles(x_ref[:, :], G)

        flat = pl.pallas_call(
            kf, out_shape=jax.ShapeDtypeStruct((G, ph.TSQ), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=True)(jnp.asarray(x))
        assert np.array_equal(np.asarray(flat), x.reshape(G, ph.TSQ))

        def ke(x_ref, o_ref, G=G):
            o_ref[:, :] = ph._expand_tiles(x_ref[:, :], G)

        back = pl.pallas_call(
            ke, out_shape=jax.ShapeDtypeStruct((G * ph.TS, ph.TS), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=True)(flat)
        assert np.array_equal(np.asarray(back), x)
