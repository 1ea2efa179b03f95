"""Robustness against corrupt/adversarial inputs.

The decoder consumes untrusted bitstreams: field values (root magnitude
bit-count, plane counts) are attacker-controlled VLIs and must be
range-checked before they become shift amounts or loop bounds
(dwt_tpu/native/entropy_decode.cpp).  The encoder must hard-error — never
emit a silently-wrong stream — when an image exceeds the format's static
limits (magnitude < 2^29, single-stream size < 2^31 bits).
"""

import numpy as np
import pytest

from dwt_tpu.codec import decoder, encoder


def _header(w, h, gray):
    return bytes([
        ord("W"), ord("5") if gray else ord("6"),
        (w - 1) & 255, ((w - 1) >> 8) & 255,
        (h - 1) & 255, ((h - 1) >> 8) & 255,
    ])


def test_huge_root_cnt_is_hard_error():
    # Payload: an adaptive-VLI codeword for a ~2^47 root bit-count (48
    # escalating prefix zeros, terminator, 48 raw bits).  Without the
    # range check this became a >=64-bit shift in read_bits (UB); the
    # reference's behavior on such a stream is an error/EOF exit.
    payload = b"\x00" * 6 + b"\x01" + b"\x00" * 6 + b"\xff" * 8
    with pytest.raises(ValueError):
        decoder.decode(_header(16, 16, gray=True) + payload)


def test_huge_plane_count_is_hard_error():
    # Root cnt = 0 (single 1 bit), then a ~2^46 plane count VLI.
    payload = b"\x01" + b"\x00" * 5 + b"\x01" + b"\xff" * 8
    with pytest.raises(ValueError):
        decoder.decode(_header(16, 16, gray=True) + payload)


def test_truncated_root_is_hard_error():
    with pytest.raises(ValueError):
        decoder.decode(_header(64, 64, gray=False) + b"\xfe")


def test_planes_guard():
    # planes <= PMAX (29, the format's magnitude ceiling) pass through;
    # beyond it the encoder must raise instead of silently dropping the
    # top bitplanes (triggering this end-to-end needs an adversarial
    # deep-pyramid image whose detail magnitudes exceed 2^29 — the guard
    # is on the planes_max statistic the device pipeline computes).
    assert encoder._check_planes(encoder.PMAX) == encoder.PMAX
    with pytest.raises(ValueError, match="bitplanes"):
        encoder._check_planes(encoder.PMAX + 1)


def test_stream_bits_guard():
    # Streams at/above 2^31 bits would have wrapped the int32 bit-offset
    # chain; the exact int64 count computed on device trips this guard
    # (pointing at the tiled container) instead of emitting garbage.
    assert encoder._check_stream_bits(2**31 - 1) == 2**31 - 1
    with pytest.raises(ValueError, match="tiled"):
        encoder._check_stream_bits(2**31)


def test_pmax_covers_format_ceiling():
    # The coding flags live in bits 29/30 (encode.c:115-128), so no valid
    # stream exceeds 29 planes — PMAX must cover every legal image so the
    # schedule grid never silently clips.
    assert encoder.PMAX == 29
    assert encoder.LMAX >= 2 * max(16, encoder.PMAX) - 1


def test_bitflip_fuzz_never_crashes():
    """Single-bit corruptions of a valid stream must decode to SOMETHING or
    raise ValueError — never crash, hang, or hit UB in the native parser.
    (The reference decoder's behavior on corrupt input is exit-with-error;
    ours must stay memory-safe for the same inputs.)"""
    import sys

    sys.path.insert(0, "tests")
    from conftest import random_image

    rng = np.random.default_rng(77)
    img = random_image(rng, 96, 64, 3, "mixed")
    stream = bytearray(encoder.encode(img))
    for _ in range(40):
        pos = int(rng.integers(6, len(stream)))  # keep the header valid
        bit = int(rng.integers(0, 8))
        mut = bytearray(stream)
        mut[pos] ^= 1 << bit
        try:
            out, _ = decoder.decode(bytes(mut))
            assert out.dtype == np.uint8
        except ValueError:
            pass


def test_random_blob_fuzz_never_crashes():
    """Pure-noise payloads behind a valid header: graceful error or a
    (garbage) image, never a crash."""
    rng = np.random.default_rng(78)
    for _ in range(30):
        n = int(rng.integers(1, 4000))
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            out, _ = decoder.decode(_header(64, 48, gray=False) + blob)
            assert out.dtype == np.uint8
        except ValueError:
            pass
