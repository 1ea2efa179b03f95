"""Stage-1 bisect: print T and stats digests under the current env gates."""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

W = int(os.environ.get("PROBE_W", "1024"))
H = int(os.environ.get("PROBE_H", "1024"))

import numpy as np
from imagegen import random_image

rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")

import jax.numpy as jnp
from dwt_tpu.codec import encoder

enc = encoder.get_encoder(W, H, 3)
t0 = time.time()
lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
gates = {k: v for k, v in os.environ.items() if k.startswith("DWT_")}
print(f"gates={gates} T={int(stats['T'])} "
      f"planes_max={int(stats['planes_max'])} "
      f"lin_sum={int(jnp.sum(lin.astype(jnp.uint32), dtype=jnp.uint32))} "
      f"lin_digest={__import__('zlib').crc32(np.asarray(lin).tobytes()):x} "
      f"dt={time.time()-t0:.1f}s", flush=True)
