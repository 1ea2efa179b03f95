"""Spec-model vs reference C binary: the ground-truth contract tests.

The strongest check is byte-identical encode: if our from-scratch encoder
emits the exact bytes of the reference on diverse inputs, every layer
(geometry, lifting, Hilbert order, sign-magnitude, schedule, RLE, VLI, bit
packing) is simultaneously verified.
"""

import numpy as np
import pytest

import oracle
from conftest import random_image
from dwt_tpu.io.pnm import pnm_bytes, read_pnm
from dwt_tpu import specmodel
from dwt_tpu.geometry import compute_pyramid

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference not mounted")


CASES = [
    (320, 240, 3, "mixed"),
    (320, 240, 1, "mixed"),
    (321, 239, 1, "mixed"),   # odd dims
    (63, 61, 3, "noise"),     # odd dims, color, incompressible... wait <8? no 63x61 fine
    (8, 8, 1, "mixed"),       # minimum size, sub-min root band
    (9, 8, 3, "noise"),
    (64, 64, 3, "flat"),      # degenerate: zero detail planes
    (128, 32, 1, "mixed"),    # wide aspect
    (16, 128, 3, "mixed"),    # tall aspect
]


@pytest.mark.parametrize("w,h,c,kind", CASES)
def test_encode_byte_identical(rng, w, h, c, kind):
    img = random_image(rng, w, h, c, kind)
    ref = oracle.ref_encode(pnm_bytes(img))
    ours = specmodel.encode(img, gray=(c == 1))
    assert ours == ref


@pytest.mark.parametrize("w,h,c,kind", CASES)
def test_decode_lossless_roundtrip(rng, w, h, c, kind):
    img = random_image(rng, w, h, c, kind)
    stream = oracle.ref_encode(pnm_bytes(img))
    out, gray = specmodel.decode(stream)
    assert gray == (c == 1)
    ref_img, _ = read_pnm(oracle.ref_decode(stream))
    np.testing.assert_array_equal(out, ref_img.astype(np.int32))
    if kind != "flat":
        # Degenerate all-flat images have zero detail planes; the reference
        # decoder then never advances past the root band (known quirk,
        # SURVEY §2.5) — for everything else the roundtrip is lossless.
        np.testing.assert_array_equal(out.squeeze(), img.squeeze().astype(np.int32))


def test_smpte_asset():
    """The reference's own checked-in test asset (with a # comment header)."""
    img, gray = read_pnm("/root/reference/smpte.pnm")
    assert not gray and img.shape == (240, 320, 3)
    ref = oracle.ref_encode(pnm_bytes(img))
    ours = specmodel.encode(img, gray=False)
    assert ours == ref
    out, _ = specmodel.decode(ref)
    np.testing.assert_array_equal(out, img.astype(np.int32))


def test_truncated_encode_is_prefix(rng):
    """CAPACITY semantics: output is exactly the prefix of the full stream."""
    img = random_image(rng, 96, 80, 3, "mixed")
    full = oracle.ref_encode(pnm_bytes(img))
    for cap in (64, 333, 1000):
        ref_cut = oracle.ref_encode(pnm_bytes(img), capacity=cap)
        assert ref_cut == full[:cap]
        assert specmodel.encode(img, gray=False, capacity=cap) == ref_cut


@pytest.mark.parametrize("cap", [64, 150, 400, 1200])
def test_truncated_decode_matches_reference(rng, cap):
    img = random_image(rng, 96, 80, 3, "mixed")
    stream = oracle.ref_encode(pnm_bytes(img))[:cap]
    try:
        ref_pnm = oracle.ref_decode(stream)
    except Exception:
        # Stream truncated inside the root band: reference exits with error.
        with pytest.raises(ValueError):
            specmodel.decode(stream)
        return
    ref_img, ref_gray = read_pnm(ref_pnm)
    out, _ = specmodel.decode(stream)
    assert out.shape == ref_img.shape
    np.testing.assert_array_equal(out, ref_img.astype(np.int32))


@pytest.mark.parametrize("pixels", [1, 300, 1200, 19200])
def test_reduced_resolution_decode(rng, pixels):
    img = random_image(rng, 96, 80, 3, "mixed")
    stream = oracle.ref_encode(pnm_bytes(img))
    ref_img, _ = read_pnm(oracle.ref_decode(stream, pixels=pixels))
    out, _ = specmodel.decode(stream, pixels_max=pixels)
    assert out.shape == ref_img.shape
    np.testing.assert_array_equal(out, ref_img.astype(np.int32))


def test_geometry_vs_reference():
    """compute_pyramid vs the reference compute_lengths via a C probe."""
    src = r"""
#include <stdio.h>
#include <stdlib.h>
#include "utils.h"
int main(int argc, char **argv) {
    int W = atoi(argv[1]), H = atoi(argv[2]);
    int lengths[16], pixels[16], widths[16], heights[16];
    int levels = compute_lengths(lengths, pixels, widths, heights, W, H, 8);
    printf("%d\n", levels);
    for (int l = 0; l <= levels; ++l)
        printf("%d %d %d %d\n", widths[l], heights[l], pixels[l], lengths[l]);
    return 0;
}
"""
    # (65536x65536 excluded: the reference's int32 pixels[] overflows there —
    # a latent reference bug; our geometry uses Python ints and is correct.)
    for w, h in [(320, 240), (8, 8), (9, 8), (321, 239), (3840, 2160),
                 (16384, 16384), (17, 1000)]:
        out = oracle.probe("geometry", src, [w, h]).strip().splitlines()
        levels = int(out[0])
        pyr = compute_pyramid(w, h)
        assert pyr.levels == levels
        for l in range(levels + 1):
            ww, hh, pp, ll = map(int, out[1 + l].split())
            assert (pyr.widths[l], pyr.heights[l], pyr.pixels[l],
                    pyr.lengths[l]) == (ww, hh, pp, ll)


def test_cdf53_1d_vs_reference(rng):
    """1-D lifting kernel forward+inverse vs C probe, odd/even N."""
    src = r"""
#include <stdio.h>
#include <stdlib.h>
#include "cdf53.h"
int main(int argc, char **argv) {
    int N = argc - 2, fwd = atoi(argv[1]);
    int *in = malloc(sizeof(int)*N), *out = malloc(sizeof(int)*N);
    for (int i = 0; i < N; ++i) in[i] = atoi(argv[i+2]);
    if (fwd) cdf53(out, in, N, 1, 1, 1); else icdf53(out, in, N, 1, 1, 1);
    for (int i = 0; i < N; ++i) printf("%d ", out[i]);
    return 0;
}
"""
    for n in [8, 9, 15, 16, 17, 64, 101]:
        x = rng.integers(-512, 512, n).astype(np.int32)
        ref_f = np.array(list(map(int, oracle.probe(
            "cdf53", src, [1] + x.tolist()).split())), np.int32)
        got_f = specmodel.cdf53_fwd_1d(x.copy(), axis=0)
        np.testing.assert_array_equal(got_f, ref_f)
        ref_i = np.array(list(map(int, oracle.probe(
            "cdf53", src, [0] + ref_f.tolist()).split())), np.int32)
        got_i = specmodel.cdf53_inv_1d(ref_f.copy(), axis=0)
        np.testing.assert_array_equal(got_i, ref_i)
        np.testing.assert_array_equal(got_i, x)


def test_hilbert_vs_reference():
    src = r"""
#include <stdio.h>
#include <stdlib.h>
#include "hilbert.h"
int main(int argc, char **argv) {
    int n = atoi(argv[1]);
    for (int d = 0; d < n * n; ++d) {
        struct position p = hilbert(n, d);
        printf("%d %d\n", p.x, p.y);
    }
    return 0;
}
"""
    from dwt_tpu.hilbert import hilbert_xy

    for n in [1, 2, 4, 8, 32, 64]:
        lines = oracle.probe("hilbert", src, [n]).strip().splitlines()
        ref = np.array([list(map(int, ln.split())) for ln in lines], np.int32)
        x, y = hilbert_xy(n)
        np.testing.assert_array_equal(x, ref[:, 0])
        np.testing.assert_array_equal(y, ref[:, 1])
