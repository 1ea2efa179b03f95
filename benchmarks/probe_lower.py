"""Lower stage-2 (no remote compile) and report HLO text size — detects
graph-size explosions that make the relay-side compile hang."""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np
from imagegen import random_image

import jax
import jax.numpy as jnp

from dwt_tpu.codec import encoder

for size in (int(s) for s in (sys.argv[1:] or ["512", "768", "1024"])):
    rng = np.random.default_rng(7)
    img = random_image(rng, size, size, 3, "mixed")
    enc = encoder.get_encoder(size, size, 3)
    lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
    T = int(stats["T"])
    pT = encoder._bucket(T)
    t0 = time.time()
    lowered = enc._get_stage2(pT).lower(lin, stats)
    txt = lowered.as_text()
    print(f"{size}: T={T} bucket={pT} lower={time.time()-t0:.1f}s "
          f"hlo_chars={len(txt)}", flush=True)
