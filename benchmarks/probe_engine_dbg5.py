"""Where are the 64 wrong lanes in each bad run, and what are they?
Map wrong got-values back to (tile, row, col) in the image."""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from dwt_tpu.codec.encoder import ALIGN  # noqa: E402
from dwt_tpu.geometry import compute_pyramid  # noqa: E402
from dwt_tpu.hilbert import padded_layout, tile_plan  # noqa: E402
from dwt_tpu.ops.pallas_hilbert import hilbert_gather_pallas  # noqa: E402

W, H = 320, 240
rng = np.random.default_rng(1)
pyr = compute_pyramid(W, H)
plan = tile_plan(pyr, ALIGN)
perm, valid, sizes = padded_layout(pyr, ALIGN)
co = rng.integers(-2**20, 2**20, (H, W, 3)).astype(np.int32)
want = co.reshape(-1, 3)[perm].T
plan2 = dict(plan)
plan2["partial"] = plan["partial"][:0]
plan2["partial_src"] = plan["partial_src"][:0]
got = np.asarray(hilbert_gather_pallas(
    jnp.asarray(co), plan2, perm.shape[0], 3, interpret=False))

clean = plan["clean"]
pats = plan["patterns"]
c0 = co[:, :, 0]
val2pos = {int(v): i for i, v in enumerate(c0.reshape(-1))}
for y, x, pid, off in clean:
    g = got[0, off:off + 1024]
    w = want[0, off:off + 1024]
    bad = np.where(g != w)[0]
    if not len(bad):
        continue
    # contiguous intervals of bad ranks
    iv = []
    for r in bad:
        if iv and r == iv[-1][1]:
            iv[-1][1] = r + 1
        else:
            iv.append([r, r + 1])
    print(f"tile ({y},{x}) pid={pid}: nbad={len(bad)} "
          f"rank-intervals={[(a, b) for a, b in iv[:8]]}")
    # src ranks within pattern: which src lanes SHOULD feed the bad ranks
    srcs = pats[pid][bad]
    print(f"   src lanes for bad ranks: rows {sorted(set(srcs // 32))} ")
    info = []
    for r in bad[:8]:
        p = val2pos.get(int(g[r]))
        if p is None:
            info.append((int(r), None))
        else:
            info.append((int(r), (p // W, p % W)))
    print(f"   got-value positions (row, col): {info}")
