"""On-device byte-parity probe: encode small images with the current kernel
configuration and compare against the reference C encoder.  Seconds per
config — the bisection tool VERDICT r2 asked for.

Usage: python benchmarks/parity_probe.py [WxH ...]
Env gates (DWT_NO_ENGINE etc.) select the configuration under test.
"""

import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def probe(w, h, content="mixed", seed=7):
    from imagegen import random_image
    import oracle
    from dwt_tpu.codec import encoder
    from dwt_tpu.io.pnm import pnm_bytes

    rng = np.random.default_rng(seed)
    img = random_image(rng, w, h, 3, content)
    stream = encoder.encode(img)
    want = oracle.ref_encode(pnm_bytes(img))
    if stream == want:
        return True, None
    # locate first divergence
    n = min(len(stream), len(want))
    i = next((k for k in range(n) if stream[k] != want[k]), n)
    return False, (i, len(stream), len(want))


def main():
    sizes = sys.argv[1:] or ["64x64", "128x96", "256x256", "512x512"]
    gates = {k: v for k, v in os.environ.items() if k.startswith("DWT_")}
    print(f"gates: {gates or 'full (none)'}", file=sys.stderr)
    bad = 0
    for s in sizes:
        w, h = map(int, s.split("x"))
        ok, info = probe(w, h)
        if ok:
            print(f"  {s}: OK", file=sys.stderr)
        else:
            bad += 1
            print(f"  {s}: MISMATCH first-diff-byte={info[0]} "
                  f"len={info[1]} want={info[2]}", file=sys.stderr)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
