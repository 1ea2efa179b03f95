"""Which pattern did the hardware actually apply to each bad clean tile?
Try got == tile[pats[q]] for every q; report matches and npat.  Also
check the 64 non-own lanes against a no-source hypothesis."""
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
print("npat:", len(pats))
c0 = co[:, :, 0]
for y, x, pid, off in clean:
    g = got[0, off:off + 1024]
    w = want[0, off:off + 1024]
    if np.array_equal(g, w):
        continue
    tile = c0[y:y + 32, x:x + 32].reshape(-1)
    hits = []
    for q in range(len(pats)):
        eq = (tile[pats[q]] == g).sum()
        hits.append((q, int(eq)))
    best = max(hits, key=lambda t: t[1])
    print(f"tile ({y},{x}) pid={pid}: best-match pattern q={best[0]} "
          f"({best[1]}/1024), all={hits}")
