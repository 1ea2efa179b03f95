"""For each bad clean run: are got values a permutation of the wanted
run's values (pattern fetch bug) or foreign (tile load / write bug)?
Also locate which image tile the foreign values came from."""
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
# value -> tile lookup: channel 0 values are unique with high probability
val2pos = {int(v): i for i, v in enumerate(co[:, :, 0].reshape(-1))}
for y, x, pid, off in clean:
    g = got[0, off:off + 1024]
    w = want[0, off:off + 1024]
    if np.array_equal(g, w):
        continue
    perm_same = np.array_equal(np.sort(g), np.sort(w))
    src = set()
    for v in g[:64]:
        p = val2pos.get(int(v))
        if p is not None:
            src.add((p // W // 32 * 32, p % W // 32 * 32))
    print(f"tile y={y} x={x} pid={pid} off={off}: perm-of-want={perm_same} "
          f"src tiles of got[:64]={sorted(src)}")
