"""TPU probe: DWT lifting cost vs memory layout.

The (H, W, C) layout puts C=3 on the lane axis — suspected cause of the
~40 ms stage-1b (ycocg+dwt) cost vs a ~1 ms bandwidth floor.  Measures:

  1. current dwt2d_fwd on (H, W, C) int32
  2. planar dwt on (C, H, W): same slice arithmetic, lanes = W
  3. the (H, W, C) -> (C, H, W) deinterleave alone (XLA transpose)
  4. ycocg on both layouts
  5. per-axis cdf53 on (C, H, W) to see which direction dominates

Scalar-only syncs; enqueue N then sync (relay timing protocol).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from dwt_tpu.geometry import compute_pyramid
from dwt_tpu.ops.color import rgb_to_ycocg
from dwt_tpu.ops.lifting import cdf53_fwd, dwt2d_fwd

W, H, C = 3840, 2160, 3
N = 4
pyr = compute_pyramid(W, H)

rng = np.random.default_rng(0)
img = rng.integers(0, 256, (H, W, C)).astype(np.int32)
x_hwc = jnp.asarray(img)
x_chw = jnp.asarray(np.moveaxis(img, 2, 0).copy())

print("backend:", jax.default_backend(), file=sys.stderr, flush=True)


def timed(name, fn, *args):
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.uint32)))
    int(g(*args))
    t0 = time.time()
    outs = [g(*args) for _ in range(N)]
    for o in outs:
        int(o)
    dt = (time.time() - t0) / N
    print(f"{name:40s} {dt*1e3:8.1f} ms", file=sys.stderr, flush=True)


def dwt2d_fwd_planar(x):
    """(C, H, W) planar variant of dwt2d_fwd (same slice arithmetic)."""
    out = x
    for l in range(pyr.levels, 0, -1):
        w, h = pyr.widths[l], pyr.heights[l]
        sub = out[:, :h, :w]
        sub = cdf53_fwd(sub, axis=2)
        sub = cdf53_fwd(sub, axis=1)
        out = (out.at[:, :h, :w].set(sub)
               if (h, w) != out.shape[1:] else sub)
    return out


timed("dwt2d_fwd (H,W,C)", dwt2d_fwd, x_hwc, pyr)
timed("dwt2d_fwd planar (C,H,W)", dwt2d_fwd_planar, x_chw)
timed("deinterleave (H,W,C)->(C,H,W)",
      lambda x: jnp.moveaxis(x, 2, 0), x_hwc)
timed("interleave (C,H,W)->(H,W,C)",
      lambda x: jnp.moveaxis(x, 0, 2), x_chw)
timed("ycocg (H,W,C)", rgb_to_ycocg, x_hwc)
timed("ycocg planar (stacked)",
      lambda x: rgb_to_ycocg(jnp.moveaxis(x, 0, 2)), x_chw)
timed("cdf53 lanes only (C,H,W ax2)",
      lambda x: cdf53_fwd(x, axis=2), x_chw)
timed("cdf53 sublanes only (C,H,W ax1)",
      lambda x: cdf53_fwd(x, axis=1), x_chw)
timed("cdf53 ax1 (H,W,C)", lambda x: cdf53_fwd(x, axis=0), x_hwc)
timed("cdf53 ax2 (H,W,C)", lambda x: cdf53_fwd(x, axis=1), x_hwc)
print("DONE", file=sys.stderr, flush=True)
