"""TPU correctness probe for the Pallas compaction kernels: encode small
images on the TPU (kernel path) and require byte-identical streams vs the
sequential spec model (host)."""
import sys
import time

import numpy as np

sys.path.insert(0, "tests")
from imagegen import random_image  # noqa: E402

import jax  # noqa: E402

from dwt_tpu import specmodel  # noqa: E402
from dwt_tpu.codec import encoder  # noqa: E402

print("backend:", jax.default_backend())

rng = np.random.default_rng(42)
cases = [
    (64, 64, 3, "noise"),
    (128, 96, 3, "mixed"),
    (320, 240, 1, "mixed"),
    (257, 129, 3, "texture"),
]
for (w, h, c, kind) in cases:
    img = random_image(rng, w, h, c, kind)
    t0 = time.time()
    got = encoder.encode(img, gray=(c == 1))
    want = specmodel.encode(img, gray=(c == 1))
    ok = got == want
    print(f"{w}x{h}x{c} {kind}: {'OK' if ok else 'MISMATCH'} "
          f"({len(got)} vs {len(want)} bytes, {time.time()-t0:.1f}s)")
    if not ok:
        # locate first differing byte for debugging
        m = min(len(got), len(want))
        i = next((j for j in range(m) if got[j] != want[j]), m)
        print("  first diff at byte", i, "of", m)
        sys.exit(1)
print("ALL OK")
