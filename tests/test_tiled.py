"""Batch throughput mode + tiled container tests."""

import numpy as np
import pytest

import oracle
from conftest import random_image
from dwt_tpu.io.pnm import read_pnm

jax = pytest.importorskip("jax")

from dwt_tpu import specmodel  # noqa: E402
from dwt_tpu.codec import tiled  # noqa: E402


def test_batch_encode_matches_single(rng):
    """Each stream of a vmapped batch must equal the single-image encoder."""
    imgs = np.stack([random_image(rng, 64, 48, 3, k)
                     for k in ("mixed", "noise", "mixed", "flat")])
    enc = tiled.get_batch_encoder(64, 48, 3)
    streams = enc.encode_batch(imgs)
    for i, s in enumerate(streams):
        assert s == specmodel.encode(imgs[i], gray=False)


@pytest.mark.skipif(not oracle.available(), reason="reference not mounted")
def test_batch_streams_decode_with_reference(rng):
    imgs = np.stack([random_image(rng, 48, 32, 1, "mixed") for _ in range(3)])
    enc = tiled.get_batch_encoder(48, 32, 1)
    for i, s in enumerate(enc.encode_batch(imgs)):
        out, _ = read_pnm(oracle.ref_decode(s))
        np.testing.assert_array_equal(out.squeeze(), imgs[i].squeeze())


def test_tiled_container_lossless(rng):
    img = random_image(rng, 200, 120, 3, "mixed")  # uneven tile edges
    data = tiled.encode_tiled(img, tile=(64, 64))
    out, gray = tiled.decode_tiled(data)
    assert not gray
    np.testing.assert_array_equal(out, img)


def test_tiled_container_gray_lossless(rng):
    img = random_image(rng, 128, 128, 1, "mixed")
    data = tiled.encode_tiled(img, tile=(64, 64))
    out, gray = tiled.decode_tiled(data)
    assert gray
    np.testing.assert_array_equal(out, img)


def test_tiled_budget_truncation(rng):
    img = random_image(rng, 128, 128, 3, "mixed")
    full = tiled.encode_tiled(img, tile=(64, 64))
    budget = len(full) // 3
    cut = tiled.encode_tiled(img, tile=(64, 64), budget=budget)
    assert len(cut) <= budget
    out, _ = tiled.decode_tiled(cut)
    assert out.shape == img.shape
    # Quality should be decent: PSNR above a loose floor.
    mse = np.mean((out.astype(np.float64) - img) ** 2)
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr > 20, psnr
    # And the budget allocation must not zero out any tile.
    n = (128 // 64) ** 2
    table = np.frombuffer(cut[16 : 16 + 4 * n], "<u4")
    assert (table > 0).all()


def test_tiled_sub8_edge_absorbed(rng):
    """A trailing remainder below the 8-pixel minimum merges into the last
    tile instead of producing an illegal tiny tile."""
    img = random_image(rng, 197, 70, 3, "mixed")  # 197 = 3*64 + 5
    data = tiled.encode_tiled(img, tile=(64, 64))
    out, _ = tiled.decode_tiled(data)
    np.testing.assert_array_equal(out, img)


def test_tiled_reduced_resolution(rng):
    """Exact oracle: the reduced-resolution mosaic must equal, tile for
    tile, the single-stream decoder run at the same pixels_max on each
    tile stream, replication-upsampled the same way (the mosaic is fully
    deterministic; decode.c:165-171 is the single-stream analog)."""
    import struct

    from dwt_tpu.codec import decoder

    img = random_image(rng, 128, 128, 3, "mixed")
    data = tiled.encode_tiled(img, tile=(64, 64))
    out, _ = tiled.decode_tiled(data, pixels_max=256)  # each tile <= 16x16
    assert out.shape == img.shape  # replication-upsampled mosaic

    # Compose the expected mosaic on the host from per-tile decodes.
    _, _, W, H, tw, th = struct.unpack("<BBIIHH", data[2:16])
    spans = [(y0, x0, hh, ww)
             for y0, hh in tiled._tile_spans(H, th)
             for x0, ww in tiled._tile_spans(W, tw)]
    n = len(spans)
    table = np.frombuffer(data[16 : 16 + 4 * n], "<u4")
    off = 16 + 4 * n
    want = np.zeros((H, W, 3), np.uint8)
    for (y0, x0, hh, ww), ln in zip(spans, table):
        payload = data[off : off + int(ln)]
        off += int(ln)
        hdr = bytes([ord("W"), ord("6"), (ww - 1) & 255, (ww - 1) >> 8,
                     (hh - 1) & 255, (hh - 1) >> 8])
        timg, _ = decoder.decode(hdr + payload, pixels_max=256)
        timg = np.asarray(timg)
        oh, ow = timg.shape[:2]
        if (oh, ow) != (hh, ww):
            ry = (hh + oh - 1) // oh
            rx = (ww + ow - 1) // ow
            timg = np.repeat(np.repeat(timg, ry, 0), rx, 1)[:hh, :ww]
        want[y0 : y0 + hh, x0 : x0 + ww] = timg
    np.testing.assert_array_equal(out, want)


def test_oversized_single_stream_routes_to_container(rng, monkeypatch):
    """encoder.encode transparently emits the tiled .dwtt container when a
    single .dwt stream could overflow its int32 bit offsets, preserving the
    reference's 65536^2 format envelope (encode.c:140) behind one API.  The
    ceiling is shrunk so CI exercises the route without a >2^31-bit image."""
    from dwt_tpu.codec import decoder, encoder

    monkeypatch.setattr(encoder, "SINGLE_STREAM_MAX_COEFFS", 64 * 64 * 3 - 1)
    img = random_image(rng, 96, 64, 3, "mixed")
    data = encoder.encode(img)
    assert data[:2] == b"WT"
    back, gray = decoder.decode(data)
    assert not gray and np.array_equal(back, img)
    # under the ceiling: still a plain single stream
    small = random_image(rng, 32, 48, 3, "mixed")
    assert encoder.encode(small)[:1] == b"W"
    assert encoder.encode(small)[:2] != b"WT"


def test_tiled_budget_masking_byte_identical(rng, monkeypatch):
    """Budget-bounded WORK on the tiled path: the conservative layer mask
    applied before stage 2 must leave the container bytes identical to
    the encode-lossless-then-cut path (VERDICT r4 #5/#6), while actually
    skipping schedule work for a deep budget."""
    from dwt_tpu.codec import encoder

    img = random_image(rng, 160, 128, 3, "mixed")
    full = tiled.encode_tiled(img, tile=(64, 64))
    budget = len(full) // 6  # deep truncation

    calls = {"masked": 0}
    real = encoder._truncate_schedule_to_layer

    def spy(h, k, pyr, C):
        u = real(h, k, pyr, C)
        if u is not None:
            calls["masked"] += 1
        return u

    monkeypatch.setattr(encoder, "_truncate_schedule_to_layer", spy)
    got = tiled.encode_tiled(img, tile=(64, 64), budget=budget)
    assert calls["masked"] > 0  # the deep budget really skipped work

    # Reference result: same path with masking disabled (pure lossless
    # encode + allocation cut).
    monkeypatch.setattr(encoder, "_truncate_schedule_to_layer",
                        lambda *a: None)
    want = tiled.encode_tiled(img, tile=(64, 64), budget=budget)
    assert got == want
    assert len(got) <= budget
