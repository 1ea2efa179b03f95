"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests
run against XLA's host-platform device simulation instead (SURVEY.md §4.4).
Environment must be set before jax is first imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))

# The axon TPU plugin (sitecustomize) programmatically forces the platform
# to the tunneled TPU, overriding JAX_PLATFORMS env — override it back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


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
