"""Per bad clean run: fraction of lanes holding own-tile values, whether
the run is a permutation of want over ALL 1024 lanes, and whether the
host-side pattern table itself reproduces want (i.e. is the plan right
and only the hardware wrong?)."""
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
for y, x, pid, off in clean:
    g = got[0, off:off + 1024]
    w = want[0, off:off + 1024]
    if np.array_equal(g, w):
        continue
    tilevals = set(c0[y:y + 32, x:x + 32].reshape(-1).tolist())
    own = np.array([int(v) in tilevals for v in g])
    permful = np.array_equal(np.sort(g), np.sort(w))
    # host-side check: does pattern pid applied to this tile give want?
    tile = c0[y:y + 32, x:x + 32].reshape(-1)
    hostpat = tile[np.argsort(pats[pid])] if False else None
    # pats[pid] semantics: oh[src_lane, rank] = 1 where src = pats[pid][rank]
    host = tile[pats[pid]]
    print(f"tile ({y},{x}) pid={pid} off={off}: own-lanes={own.sum()}/1024 "
          f"full-perm={permful} host-pattern-matches-want="
          f"{np.array_equal(host, w)}")
