"""Gather-locality probe: the stage-1 Hilbert linearization gather costs
~120 ms at 4K (random access over the row-major plane).  Hilbert indices
are spatially local, so composing a dense tile-major relayout (cheap XLA
transpose) with a remapped gather should turn the random access into
near-sequential access.  Times both forms on the real TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, "tests")
from imagegen import random_image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dwt_tpu.codec import encoder  # noqa: E402
from dwt_tpu.geometry import compute_pyramid  # noqa: E402
from dwt_tpu.hilbert import padded_layout  # noqa: E402

W, H = 3840, 2160
N = 4
TS = 32  # tile side

rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")
pyr = compute_pyramid(W, H)
perm_np, _, _ = padded_layout(pyr, encoder.ALIGN)
perm = jnp.asarray(perm_np)

co = jnp.asarray(rng.integers(-1000, 1000, (H, W, 3)).astype(np.int32))
Hp, Wp = -(-H // TS) * TS, -(-W // TS) * TS

# Tile-major remap of the same permutation (host, cached per geometry).
ty, tx = perm_np // W // TS, perm_np % W // TS
iy, ix = perm_np // W % TS, perm_np % W % TS
perm2_np = ((ty * (Wp // TS) + tx) * TS + iy) * TS + ix
perm2 = jnp.asarray(perm2_np.astype(np.int32))


def tilemajor(co):
    cp = jnp.pad(co, ((0, Hp - H), (0, Wp - W), (0, 0)))
    return (cp.reshape(Hp // TS, TS, Wp // TS, TS, 3)
            .transpose(0, 2, 1, 3, 4).reshape(-1, 3))


def timed(name, fn, *args):
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.uint32)))
    int(g(*args))
    t0 = time.time()
    outs = [g(*args) for _ in range(N)]
    for o in outs:
        int(o)
    print(f"{name:28s} {(time.time()-t0)/N*1e3:8.1f} ms",
          file=sys.stderr, flush=True)


timed("rowmajor gather", lambda co: co.reshape(-1, 3)[perm].T, co)
timed("tile relayout only", tilemajor, co)
timed("tilemajor gather", lambda co: tilemajor(co)[perm2].T, co)
timed("gather as 3 planes",
      lambda co: co.reshape(-1, 3).T[:, perm], co)
timed("one-channel gather", lambda co: co.reshape(-1, 3)[:, 0][perm], co)
print("DONE", file=sys.stderr, flush=True)
