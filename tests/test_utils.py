"""Tracing harness + sanitizer-mode tests."""

import numpy as np
import pytest

from conftest import random_image

jax = pytest.importorskip("jax")


def test_selfcheck_mode_passes(rng, monkeypatch):
    """DWT_SELFCHECK=1: a healthy encode verifies and returns normally."""
    from dwt_tpu.codec import encoder

    monkeypatch.setenv("DWT_SELFCHECK", "1")
    img = random_image(rng, 48, 40, 3, "mixed")
    stream = encoder.encode(img)
    assert stream[:1] == b"W"


def test_selfcheck_mode_catches_corruption(rng, monkeypatch):
    """A corrupted device stage must be caught by the self-check, not
    emitted silently."""
    from dwt_tpu.codec import encoder

    monkeypatch.setenv("DWT_SELFCHECK", "1")
    img = random_image(rng, 48, 40, 1, "mixed")
    enc = encoder.Encoder(48, 40, 1)
    real = enc._get_stage2

    def broken(padded_T):
        fn = real(padded_T)

        def wrap(lin, stats):
            words, bits, wild, ends = fn(lin, stats)
            # flip a stream bit
            return words.at[3].add(1 << 17), bits, wild, ends

        return wrap

    enc._get_stage2 = broken
    with pytest.raises(AssertionError, match="DWT_SELFCHECK"):
        enc.encode(img)


def test_stage_timer_report():
    from dwt_tpu.utils.trace import StageTimer

    t = StageTimer()
    x = np.arange(4)
    t.mark("a", x)
    t.mark("b")
    rep = t.report()
    assert "a" in rep and "total" in rep


def test_device_trace_produces_files(tmp_path):
    import jax.numpy as jnp

    from dwt_tpu.utils.trace import device_trace

    with device_trace(str(tmp_path)):
        int(jnp.sum(jnp.arange(16)))
    assert any(tmp_path.rglob("*"))


def test_aot_cached_cpu_is_plain_jit(tmp_path, monkeypatch):
    """On CPU the executable store must stay out of the way (XLA:CPU
    deserialization fails at dispatch) — aot_cached returns a working
    callable and writes no blobs."""
    import jax.numpy as jnp

    from dwt_tpu.runtime import cache

    fn = cache.aot_cached(lambda x: jnp.sum(x * 2), "test-cpu-",
                          (jnp.arange(16, dtype=jnp.int32),))
    assert int(fn(jnp.arange(16, dtype=jnp.int32))) == 240
    import glob
    import os

    pkg_repo = os.path.dirname(os.path.dirname(
        os.path.abspath(cache.__file__)))
    assert not glob.glob(os.path.join(os.path.dirname(pkg_repo),
                                      "warmcache", "*-exec", "test-cpu-*"))
