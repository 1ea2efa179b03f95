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

from imagegen import random_image  # noqa: F401  (re-export for tests)


@pytest.fixture()
def rng(request):
    # Function-scoped and seeded per test id (stable hash): images are
    # deterministic regardless of which subset/order of tests runs (a
    # session-scoped rng made failures order-dependent and unreproducible
    # in isolation — which is how the truncation sequence-point bug hid).
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))
