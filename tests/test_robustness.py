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
