"""Split kernel A's 4K cost: full kernel vs one-hot placement stubbed out.

The stub keeps the DMA, classification, rank scans, tgt/val buffer writes,
block reductions and the fori_loop — only `_onehot_place` becomes a no-op —
so (full - stub) isolates the MXU one-hot placement cost.  Output is wrong
under the stub; only the timing is meaningful.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "tests")
from imagegen import random_image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dwt_tpu.codec import encoder  # noqa: E402
from dwt_tpu.codec.encoder import _bucket, _sig_tokens_pallas  # noqa: E402
from dwt_tpu.ops import pallas_compact as pc  # noqa: E402

W, H = 3840, 2160
N = 4

rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")
enc = encoder.get_encoder(W, H, 3)
lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
T = int(stats["T"])
padded_T = _bucket(T)
pyr, C = enc.pyr, 3


def timed(name, fn, *args):
    g = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.uint32))
                               for x in jax.tree.leaves(fn(*a))))
    int(g(*args))
    t0 = time.time()
    outs = [g(*args) for _ in range(N)]
    for o in outs:
        int(o)
    dt = (time.time() - t0) / N
    print(f"{name:28s} {dt*1e3:8.1f} ms", file=sys.stderr, flush=True)


timed("A full", lambda lin, stats: _sig_tokens_pallas(lin, stats, pyr, C,
                                                      padded_T), lin, stats)

orig = pc._onehot_place
pc._onehot_place = lambda *a, **k: None
try:
    timed("A no-placement",
          lambda lin, stats: _sig_tokens_pallas(lin, stats, pyr, C, padded_T),
          lin, stats)
finally:
    pc._onehot_place = orig

# Unit/row statistics for the cost model: per-unit nsig and per-row target
# counts, computed on host from the same classification the kernel does.
meta = None
