"""Hybrid (native parse + TPU inverse) decoder vs reference behavior."""

import numpy as np
import pytest

import oracle
from conftest import random_image
from dwt_tpu.io.pnm import pnm_bytes, read_pnm

jax = pytest.importorskip("jax")

from dwt_tpu.codec import decoder  # noqa: E402

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference not mounted")

CASES = [
    (320, 240, 3, "mixed"),
    (321, 239, 1, "mixed"),
    (8, 8, 1, "mixed"),
    (9, 8, 3, "noise"),
    (64, 64, 3, "flat"),
    (96, 80, 3, "mixed"),
]


@pytest.mark.parametrize("w,h,c,kind", CASES)
def test_decode_matches_reference(rng, w, h, c, kind):
    img = random_image(rng, w, h, c, kind)
    stream = oracle.ref_encode(pnm_bytes(img))
    ref_img, _ = read_pnm(oracle.ref_decode(stream))
    got, gray = decoder.decode(stream)
    assert gray == (c == 1)
    assert got.shape == ref_img.shape
    np.testing.assert_array_equal(got, ref_img)


@pytest.mark.parametrize("cap", [64, 150, 400, 1200, 5000])
def test_decode_truncated(rng, cap):
    img = random_image(rng, 96, 80, 3, "mixed")
    stream = oracle.ref_encode(pnm_bytes(img))[:cap]
    try:
        ref_img, _ = read_pnm(oracle.ref_decode(stream))
    except Exception:
        with pytest.raises(ValueError):
            decoder.decode(stream)
        return
    got, _ = decoder.decode(stream)
    assert got.shape == ref_img.shape
    np.testing.assert_array_equal(got, ref_img)


@pytest.mark.parametrize("pixels", [1, 300, 1200, 19200])
def test_decode_reduced_resolution(rng, pixels):
    img = random_image(rng, 96, 80, 3, "mixed")
    stream = oracle.ref_encode(pnm_bytes(img))
    ref_img, _ = read_pnm(oracle.ref_decode(stream, pixels=pixels))
    got, _ = decoder.decode(stream, pixels_max=pixels)
    assert got.shape == ref_img.shape
    np.testing.assert_array_equal(got, ref_img)


def test_decode_smpte_lossless():
    img, _ = read_pnm("/root/reference/smpte.pnm")
    stream = oracle.ref_encode(pnm_bytes(img))
    got, gray = decoder.decode(stream)
    np.testing.assert_array_equal(got, img)


@pytest.mark.skipif(not oracle.available(), reason="reference not mounted")
def test_truncation_sequence_points():
    """Parity at many truncation offsets: the reference writes the
    significance bit BEFORE the sign read (decode.c:79-83), so a stream cut
    between them must leave the bit set — regression for the hybrid parser."""
    for seed in (2, 7, 11):
        img = np.asarray(
            __import__("imagegen").random_image(
                np.random.default_rng(seed), 64, 48, 3, "mixed"))
        stream = oracle.ref_encode(pnm_bytes(img))
        for cap in (200, 333, 500, 900, 1500):
            cut = stream[:cap]
            try:
                ref_img, _ = read_pnm(oracle.ref_decode(cut))
            except Exception:
                with pytest.raises(ValueError):
                    decoder.decode(cut)
                continue
            got, _ = decoder.decode(cut)
            np.testing.assert_array_equal(got, ref_img)
