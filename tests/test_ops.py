"""JAX ops vs the sequential spec model (itself verified against the C)."""

import numpy as np
import pytest

from dwt_tpu import specmodel
from dwt_tpu.geometry import compute_pyramid

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dwt_tpu.ops import color, lifting  # noqa: E402


@pytest.mark.parametrize("n", [8, 9, 15, 16, 17, 101, 240])
def test_cdf53_1d(rng, n):
    x = rng.integers(-1000, 1000, (n, 5)).astype(np.int32)
    ours_f = np.asarray(lifting.cdf53_fwd(jnp.asarray(x), axis=0))
    spec_f = specmodel.cdf53_fwd_1d(x.copy(), axis=0)
    np.testing.assert_array_equal(ours_f, spec_f)
    back = np.asarray(lifting.cdf53_inv(jnp.asarray(ours_f), axis=0))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("w,h", [(320, 240), (321, 239), (8, 8), (64, 48), (17, 1000)])
def test_dwt2d_multilevel(rng, w, h):
    img = rng.integers(-255, 256, (h, w, 3)).astype(np.int32)
    pyr = compute_pyramid(w, h)
    fwd = jax.jit(lambda x: lifting.dwt2d_fwd(x, pyr))
    inv = jax.jit(lambda x: lifting.dwt2d_inv(x, pyr))
    ours = np.asarray(fwd(jnp.asarray(img)))
    spec = specmodel.dwt2d_fwd(img, pyr)
    np.testing.assert_array_equal(ours, spec)
    np.testing.assert_array_equal(np.asarray(inv(jnp.asarray(ours))), img)


def test_ycocg(rng):
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.int32)
    ours = np.asarray(color.rgb_to_ycocg(jnp.asarray(img)))
    spec = specmodel.rgb_to_ycocg(img)
    np.testing.assert_array_equal(ours, spec)
    back = np.asarray(color.ycocg_to_rgb(jnp.asarray(ours)))
    np.testing.assert_array_equal(back, img)


def test_dwt_batched_vmap(rng):
    """Throughput mode relies on vmapping the whole transform over tiles."""
    imgs = rng.integers(-255, 256, (4, 64, 64, 1)).astype(np.int32)
    pyr = compute_pyramid(64, 64)
    fwd = jax.jit(jax.vmap(lambda x: lifting.dwt2d_fwd(x, pyr)))
    got = np.asarray(fwd(jnp.asarray(imgs)))
    for i in range(4):
        np.testing.assert_array_equal(got[i], specmodel.dwt2d_fwd(imgs[i], pyr))
