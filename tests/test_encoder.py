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


@pytest.mark.parametrize("w,h,c,kind", [
    (96, 80, 3, "noise"),
    (321, 239, 1, "mixed"),
    (64, 64, 3, "flat"),
])
def test_plane_stats_hist_equals_loop(rng, w, h, c, kind, monkeypatch):
    """The one-hot histogram stats (three fused passes) must agree with the
    rolled per-plane loop on every step a consumer can see (valid slots;
    see _plane_stats' docstring for the p >= planes_max difference)."""
    import jax.numpy as jnp
    import numpy as np

    from dwt_tpu.codec.encoder import (PMAX, _plane_stats, _plane_stats_loop,
                                       _Segs, _detail_q)
    from dwt_tpu.geometry import compute_pyramid
    from dwt_tpu.hilbert import padded_layout

    img = random_image(rng, w, h, c, kind)
    enc = encoder.get_encoder(w, h, c)
    lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
    segs = _Segs(enc.pyr)
    q, _, _, valid = _detail_q(lin, segs)
    L = enc.pyr.levels
    pm = stats["planes_max"]
    got = _plane_stats(q, valid, segs, c, L, pm)
    want = _plane_stats_loop(q, valid, segs, c, L, pm)
    pmi = int(pm)
    names = ["nS", "nZ", "trailZ", "nS_ck", "nZ_ck"]
    for name, g, w_ in zip(names, got, want):
        g, w_ = np.asarray(g), np.asarray(w_)
        assert np.array_equal(g[..., :pmi], w_[..., :pmi]), name
