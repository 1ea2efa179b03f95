"""Parallel TPU encoder vs the sequential spec model (byte-identical)."""

import pytest

from conftest import random_image
from dwt_tpu import specmodel

jax = pytest.importorskip("jax")

from dwt_tpu.codec import encoder  # noqa: E402


CASES = [
    (64, 64, 1, "mixed"),
    (64, 64, 3, "mixed"),
    (96, 80, 3, "noise"),
    (321, 239, 1, "mixed"),
    (8, 8, 1, "mixed"),
    (9, 8, 3, "noise"),
    (64, 64, 3, "flat"),
    (128, 32, 1, "mixed"),
    (320, 240, 3, "mixed"),
]


@pytest.mark.parametrize("w,h,c,kind", CASES)
def test_encoder_matches_spec(rng, w, h, c, kind):
    img = random_image(rng, w, h, c, kind)
    want = specmodel.encode(img, gray=(c == 1))
    got = encoder.encode(img)
    assert got == want


def test_encoder_smpte():
    from dwt_tpu.io.pnm import read_pnm

    img, gray = read_pnm("/root/reference/smpte.pnm")
    want = specmodel.encode(img, gray=False)
    got = encoder.encode(img)
    assert got == want


def test_encoder_capacity(rng):
    img = random_image(rng, 64, 64, 3, "mixed")
    full = encoder.encode(img)
    assert encoder.encode(img, capacity=100) == full[:100]
