"""Synthetic test-image generator (platform-neutral — no jax side effects).

Kept separate from conftest.py so benchmarks and tools can import it
without inheriting the test suite's forced-CPU jax configuration.
"""

import numpy as np


def random_image(rng, w, h, channels, kind="mixed"):
    """Test images spanning flat/noise/texture content."""
    if kind == "flat":
        return np.full((h, w, channels), 128, np.uint8)
    if kind == "noise":
        return rng.integers(0, 256, (h, w, channels), dtype=np.uint8)
    # mixed: smooth gradient + texture + noise patches (compressible but busy)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // max(w - 1, 1) + yy * 127 // max(h - 1, 1)) % 256
    tex = (32 * np.sin(xx / 3.0) * np.cos(yy / 5.0)).astype(np.int32)
    img = np.stack([(base + tex + 31 * c) % 256 for c in range(channels)], axis=-1)
    noise = rng.integers(-8, 9, img.shape)
    mask = (xx // 16 + yy // 16) % 3 == 0
    img = img + noise * mask[..., None]
    return np.clip(img, 0, 255).astype(np.uint8)
