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
    monkeypatch.setattr(pc, "WREF", 2048 // 32 + 256)
    monkeypatch.setattr(pc, "INTERPRET", True)
    # Small pack blocks keep the per-step base padding (and interpret-mode
    # runtime) proportionate on tiny test images.
    monkeypatch.setattr(pp, "BLOCKN", 256)
    monkeypatch.setattr(pp, "SUB", 64)
    monkeypatch.setattr(pp, "SUBSMALL", 128)
    monkeypatch.setattr(pp, "SUBWIN", 256)
    monkeypatch.setattr(pp, "WIN", 2 * 256 + 256)
    monkeypatch.setattr(pp, "INTERPRET", True)
    yield


@pytest.mark.parametrize("kind", ["noise", "mixed"])
def test_stage2_kernels_byte_identical(small_kernels, monkeypatch, kind):
    from dwt_tpu import specmodel
    from dwt_tpu.codec import encoder

    rng = np.random.default_rng(11)
    img = random_image(rng, 64, 48, 3, kind)

    monkeypatch.setattr(encoder, "_use_pallas", lambda: True)
    monkeypatch.setattr(encoder, "_use_pallas_pack", lambda t: True)
    enc = encoder.Encoder(64, 48, 3)
    got = enc.encode(img)

    want = specmodel.encode(img, gray=False)
    assert got == want
