"""Hardware parity probe for the rewritten (2026-08 Mosaic tile-aligned)
Hilbert gather/scatter engines: run the exact interpret-mode test checks
on the real device.  Usage: python benchmarks/probe_engine_hw.py [W H]"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from dwt_tpu.codec.encoder import ALIGN  # noqa: E402
from dwt_tpu.geometry import compute_pyramid  # noqa: E402
from dwt_tpu.hilbert import (linearization_perm, padded_layout,  # noqa: E402
                             tile_plan)
from dwt_tpu.ops.pallas_hilbert import (engine_supported,  # noqa: E402
                                        hilbert_gather_pallas,
                                        hilbert_scatter_pallas)

W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (320, 240)
print("devices:", jax.devices(), flush=True)
t0 = time.time()
print("engine_supported:", engine_supported(), f"({time.time()-t0:.1f}s)",
      flush=True)

rng = np.random.default_rng(1)
pyr = compute_pyramid(W, H)
plan = tile_plan(pyr, ALIGN)
perm, valid, sizes = padded_layout(pyr, ALIGN)
co = rng.integers(-2**20, 2**20, (H, W, 3)).astype(np.int32)

t0 = time.time()
got = np.asarray(hilbert_gather_pallas(
    jnp.asarray(co), plan, perm.shape[0], 3, interpret=False))
print(f"gather ran ({time.time()-t0:.1f}s)", flush=True)
want = co.reshape(-1, 3)[perm].T
m = valid.copy()
m[:sizes[0]] = False
ok = np.array_equal(got[:, m], want[:, m])
print("gather parity:", ok, flush=True)
if not ok:
    bad = np.where((got[:, m] != want[:, m]).any(axis=0))[0]
    print("  first bad ranks:", bad[:10], "of", m.sum())
    sys.exit(1)

plan1 = tile_plan(pyr, 1)
lperm = linearization_perm(pyr)
lin = co.reshape(-1, 3)[lperm].T
t0 = time.time()
back = np.asarray(hilbert_scatter_pallas(
    jnp.asarray(lin), plan1, H, W, 3, interpret=False))
print(f"scatter ran ({time.time()-t0:.1f}s)", flush=True)
mask = np.zeros(H * W, bool)
mask[lperm[pyr.pixels[0]:]] = True
ok = np.array_equal(back.reshape(-1, 3)[mask], co.reshape(-1, 3)[mask])
print("scatter parity:", ok, flush=True)
sys.exit(0 if ok else 1)
