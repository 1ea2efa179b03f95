"""Parallel TPU encoder vs the sequential spec model (byte-identical)."""

import pytest

from conftest import random_image
from dwt_tpu import specmodel

jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

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


def test_stage_bit_counters_match_reference(rng):
    """meta/root stderr counters (encode.c:176,180) replayed host-side."""
    import oracle

    if not oracle.available():
        pytest.skip("reference not present")
    from dwt_tpu.io.pnm import pnm_bytes

    for w, h, c in ((96, 80, 3), (64, 64, 1)):
        img = random_image(rng, w, h, c, "mixed")
        enc = encoder.get_encoder(w, h, c)
        _, info = enc.encode_with_stats(img)
        err = oracle.ref_encode_stderr(pnm_bytes(img))
        import re

        meta = int(re.search(r"(\d+) bits for meta data", err).group(1))
        root = int(re.search(r"(\d+) bits for root image", err).group(1))
        total = int(re.search(r"(\d+) bits \(", err).group(1))
        assert info["meta_bits"] == meta
        assert info["root_bits"] == root
        assert info["payload_bits"] + info["meta_bits"] == total


def test_budget_bounded_encode_prefix_exact(rng):
    """Budget-bounded work skipping (_truncate_schedule) must emit exactly
    the prefix of the full stream at EVERY budget class: mid-root, single
    layer, mid-schedule, near-full — and also vs the reference C encoder's
    own capacity mechanism (bytes.h:75-78)."""
    import oracle

    img = random_image(rng, 160, 128, 3, "mixed")
    full = encoder.encode(img)
    enc = encoder.get_encoder(160, 128, 3)
    for cap in (7, 20, 100, 400, 1500, len(full) // 2, len(full) - 3,
                len(full) + 50):
        got = enc.encode(img, capacity=cap)
        assert got == full[:cap], f"capacity={cap}"
    if oracle.available():
        from dwt_tpu.io.pnm import pnm_bytes

        cap = max(len(full) // 3, 8)
        assert enc.encode(img, capacity=cap) == \
            oracle.ref_encode(pnm_bytes(img), capacity=cap)


def test_budget_bounded_skips_work(rng):
    """Deep truncation must code a small fraction of the full token count
    (the point of budget-bounding: ~O(budget) entropy work)."""
    img = random_image(rng, 320, 240, 3, "mixed")
    enc = encoder.get_encoder(320, 240, 3)
    full, info_full = enc.encode_with_stats(img)
    host = {k: __import__("jax").device_get(v) for k, v in
            enc._stage1(__import__("jax").numpy.asarray(img),
                        enc._perm)[1].items()}
    upd = encoder._truncate_schedule(
        {k: host[k] for k in encoder._TRUNC_STATS_KEYS}, 2000, enc.pyr, 3)
    assert upd is not None
    assert int(upd["T"]) < int(host["T"]) // 4


def test_wild_overflow_falls_back_to_xla_pack(rng, monkeypatch):
    """A wild-block overflow must degrade to the XLA pack variant with a
    warning and identical bytes — never an availability failure (ADVICE
    r4: the AssertionError turned a content-dependent bound into a hard
    abort)."""
    import warnings

    from dwt_tpu.codec import encoder

    img = random_image(rng, 64, 48, 3, "mixed")
    enc = encoder.Encoder(64, 48, 3)
    want = enc.encode(img)

    real = enc._get_stage2

    def forced(padded_T, xla_pack=False):
        fn = real(padded_T, xla_pack)
        if xla_pack:
            return fn

        def wrap(lin, stats):
            words, bits, wild, ends = fn(lin, stats)
            return words, bits, wild + 1, ends  # claim overflow

        return wrap

    enc._get_stage2 = forced
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = enc.encode(img)
    assert got == want
    assert any("wild-block overflow" in str(x.message) for x in w)


def test_xla_pack_variant_byte_identical(rng):
    """The fallback emit path (xla_pack=True) produces the same stream as
    the default path on its own merits."""
    from dwt_tpu.codec import encoder

    img = random_image(rng, 80, 56, 3, "mixed")
    enc = encoder.Encoder(80, 56, 3)
    want = enc.encode(img)
    lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
    T = int(stats["T"])
    words, parts, wild, _ = enc._get_stage2(
        encoder._bucket(T), xla_pack=True)(lin, stats)
    total = encoder._check_stream_bits(encoder._total_bits_host(parts),
                                       bool(int(wild)))
    nbytes = (total + 7) // 8
    got = enc.header() + np.asarray(
        words[: (nbytes + 3) // 4]).tobytes()[:nbytes]
    assert got == want
