"""Property-style fuzz: random geometries and content classes.

Encoder parity is checked against the sequential spec model (itself proven
byte-identical to the reference C binary in test_specmodel.py), and decode
roundtrips through the hybrid native+TPU decoder.
"""

import numpy as np
import pytest

from conftest import random_image
from dwt_tpu import specmodel

jax = pytest.importorskip("jax")

from dwt_tpu.codec import decoder, encoder  # noqa: E402


@pytest.mark.parametrize("case", range(12))
def test_fuzz_roundtrip(case):
    rng = np.random.default_rng(9000 + case)
    w = int(rng.integers(8, 200))
    h = int(rng.integers(8, 200))
    c = int(rng.choice([1, 3]))
    kind = ["mixed", "noise", "flat"][case % 3]
    img = random_image(rng, w, h, c, kind)

    stream = encoder.encode(img)
    assert stream == specmodel.encode(img, gray=(c == 1)), (w, h, c, kind)

    out, gray = decoder.decode(stream)
    want, _ = specmodel.decode(stream)
    np.testing.assert_array_equal(out, want.astype(np.uint8), err_msg=str((w, h, c, kind)))

    # a couple of random truncation points must agree with the spec decoder
    for cap in sorted(rng.integers(8, max(len(stream), 10), 2).tolist()):
        cut = stream[:cap]
        try:
            want, _ = specmodel.decode(cut)
        except ValueError:
            with pytest.raises(ValueError):
                decoder.decode(cut)
            continue
        got, _ = decoder.decode(cut)
        np.testing.assert_array_equal(got, want.astype(np.uint8),
                                      err_msg=str((w, h, c, kind, cap)))
