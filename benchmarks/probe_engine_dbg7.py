"""Extract the effective src permutation the hardware applied per bad
tile and test it against lane-rolls of pats[pid] (and of other pats)."""
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
    tile = c0[y:y + 32, x:x + 32].reshape(-1)
    v2l = {int(v): i for i, v in enumerate(tile)}
    eff = np.array([v2l.get(int(v), -1) for v in g])
    nf = (eff < 0).sum()
    found = None
    for q in range(len(pats)):
        for sh in range(-512, 513, 32):
            cand = np.roll(pats[q], sh)
            msk = eff >= 0
            if np.array_equal(cand[msk], eff[msk]):
                found = (q, sh)
                break
        if found:
            break
    print(f"tile ({y},{x}) pid={pid}: foreign={nf} "
          f"roll-match={found} eff[:8]={eff[:8]} pat[pid][:8]={pats[pid][:8]}")
    if found is None:
        # maybe eff matches pats[pid] with a SOURCE-axis shift:
        # eff[r] = pats[pid][r] + s ?
        d = eff[eff >= 0] - pats[pid][eff >= 0]
        u = np.unique(d)
        print(f"   src-shift candidates: {u[:8]} (n={len(u)})")
