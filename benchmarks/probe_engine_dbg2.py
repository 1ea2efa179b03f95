"""Isolate: clean-only gather (partials stripped) vs full gather on
hardware.  If clean-only is exact on clean runs, the corruption lives in
the partial RMW path."""
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

clean = plan["clean"]
cmask = np.zeros(perm.shape[0], bool)
for y, x, pid, off in clean:
    cmask[off:off + 1024] = True
m = valid.copy()
m[:sizes[0]] = False

plan2 = dict(plan)
plan2["partial"] = plan["partial"][:0]
plan2["partial_src"] = plan["partial_src"][:0]
got = np.asarray(hilbert_gather_pallas(
    jnp.asarray(co), plan2, perm.shape[0], 3, interpret=False))
sel = cmask & m
print("clean-only: clean runs exact =",
      np.array_equal(got[:, sel], want[:, sel]), flush=True)

# Full plan, but compare ONLY partial positions
got2 = np.asarray(hilbert_gather_pallas(
    jnp.asarray(co), plan, perm.shape[0], 3, interpret=False))
psel = (~cmask) & m
print("full: partial positions exact =",
      np.array_equal(got2[:, psel], want[:, psel]))
print("full: clean positions exact =",
      np.array_equal(got2[:, cmask & m], want[:, cmask & m]))

# per-partial-run report: which partial steps corrupt which neighbours
part = plan["partial"]
bad = np.zeros(perm.shape[0], bool)
bidx = np.where(m)[0]
bb = (got2[:, m] != want[:, m]).any(axis=0)
bad[bidx[bb]] = True
for t, (y, x, off) in enumerate(part):
    offc = min((off // 128) * 128, perm.shape[0] + 1024 * 9 - 2048)
    w0, w1 = offc, offc + 2048
    nb = bad[w0:w1].sum()
    if nb:
        print(f"partial t={t} y={y} x={x} off={off} window[{w0},{w1}) "
              f"bad_in_window={nb}")
