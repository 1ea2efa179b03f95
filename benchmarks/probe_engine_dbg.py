"""Diagnose hardware gather mismatch: classify bad ranks vs the plan's
clean/partial runs and inspect the wrong values."""
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
got = np.asarray(hilbert_gather_pallas(
    jnp.asarray(co), plan, perm.shape[0], 3, interpret=False))
want = co.reshape(-1, 3)[perm].T
m = valid.copy()
m[:sizes[0]] = False
midx = np.where(m)[0]

bad_full = np.zeros(perm.shape[0], bool)
badm = (got[:, m] != want[:, m]).any(axis=0)
bad_full[midx[badm]] = True
print("n bad:", badm.sum(), "of", m.sum())
bads = np.where(bad_full)[0]
# contiguous bad intervals
iv = []
for r in bads:
    if iv and r == iv[-1][1]:
        iv[-1][1] = r + 1
    else:
        iv.append([r, r + 1])
print("bad intervals (first 20):", [(a, b) for a, b in iv[:20]])

clean = plan["clean"]
part = plan["partial"]
print("clean offs (sorted, first 20):", np.sort(clean[:, 3])[:20])
print("partial offs:", np.sort(part[:, 2])[:20] if len(part) else "none")
print("n clean:", len(clean), "n partial:", len(part))
# which runs do the bad intervals fall into?
for a, b in iv[:10]:
    inc = clean[(clean[:, 3] <= a) & (a < clean[:, 3] + 1024)]
    inp = part[(part[:, 2] <= a) & (a < part[:, 2] + 1024)] if len(part) \
        else []
    print(f"[{a},{b}) in clean:{inc.tolist()} partial:{list(map(list, inp))}")
# value forensics on first bad interval
a, b = iv[0]
sel = slice(a, min(b, a + 8))
print("got :", got[0, sel])
print("want:", want[0, sel])
