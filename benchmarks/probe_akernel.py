"""Analyze a kernel-A mismatch localized by probe_stage_bisect: map bad
pair ranks to units/rows, print their tier structure, and re-run the
offending units through the kernel in INTERPRET mode on the same inputs —
separating a logic bug (interpret also wrong) from a Mosaic miscompile
(interpret right, device wrong).

Run under JAX_PLATFORMS=cpu.  Usage: probe_akernel.py [W H]
"""

import functools
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
NPZ = f"/tmp/bisect_cpu_{W}x{H}.npz"
TPU_NPZ = f"/tmp/bisect_tpu_{W}x{H}.npz"  # optional: device zp/sgn dump


def p(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


import jax.numpy as jnp

from dwt_tpu.codec import encoder as E
from dwt_tpu.geometry import compute_pyramid
from dwt_tpu.ops import pallas_compact as pc

ref = np.load(NPZ)
pyr = compute_pyramid(W, H)
C = 3
padded_T = int(ref["padded_T"])
segs = E._Segs(pyr)
stats = {k[3:]: jnp.asarray(ref[k]) for k in ref.files if k.startswith("st_")}
lin = jnp.asarray(ref["lin"])

# Rebuild kernel A's meta exactly as _sig_tokens_pallas does.
com = E._unit_common(stats, segs, pyr, C)
scar = segs.level_excl_cumsum(stats["nS_ck"])
zcar = segs.level_excl_cumsum(stats["nZ_ck"])
nS_u = stats["nS_ck"].reshape(-1)[com["flat_ck"]]
u_pair0 = (stats["step_base"].reshape(-1)[com["flat_step"]] >> 1) \
    + scar.reshape(-1)[com["flat_ck"]]
npair = padded_T // 2
pairbuf = npair + pc.WTOK_BIG + 256
ws = jnp.clip(u_pair0 & ~jnp.int32(127), 0, pairbuf - pc.WTOK_BIG)
meta = jnp.stack([
    com["elem"] // pc.SUBA, com["elen"], com["p"], ws, u_pair0 - ws,
    zcar.reshape(-1)[com["flat_ck"]],
    jnp.where(com["valid"], nS_u, 0),
    jnp.zeros_like(nS_u),
], axis=1).astype(jnp.int32)
meta_np = np.asarray(meta)
u_pair0_np = np.asarray(u_pair0)
nsig_np = meta_np[:, 6]

want_zp = ref["zp"]
want_sg = ref["sgn"]

if os.path.exists(TPU_NPZ):
    got = np.load(TPU_NPZ)
    bad = np.nonzero((got["zp"] != want_zp) | (got["sgn"] != want_sg))[0]
    p(f"bad pair ranks ({len(bad)}):", bad[:20], "...")
else:
    bad = None

# Unit covering each bad rank: u_pair0 <= r < u_pair0 + nsig (valid units).
starts = np.where(nsig_np > 0, u_pair0_np, -1)
ends = np.where(nsig_np > 0, u_pair0_np + nsig_np, -1)

vmag_np = np.asarray(E._packed_elems(lin, segs))


def unit_rows(u):
    """Per-row significant counts for unit u (row = SUBA lanes)."""
    row0, elen, plane = meta_np[u, 0], meta_np[u, 1], meta_np[u, 2]
    RA = pc.E // pc.SUBA
    v = vmag_np[row0 : row0 + RA]
    gidx = np.arange(pc.E).reshape(RA, pc.SUBA)
    ok = (v >= 0) & (gidx < elen)
    mag = v & pc.MAGMASK
    mS = ok & ((mag >> plane) == 1)
    return mS.sum(axis=1)


def show_unit(u):
    rows = unit_rows(u)
    p(f"unit {u}: meta={meta_np[u].tolist()} pair0={u_pair0_np[u]} "
      f"nsig={nsig_np[u]} big={nsig_np[u] > pc.WTOK_SMALL - 192}")
    nz = np.nonzero(rows)[0]
    p(f"  row counts (nonzero rows): "
      f"{dict((int(i), int(rows[i])) for i in nz[:40])}")


if bad is not None and len(bad):
    units = sorted({int(np.nonzero((starts <= r) & (r < ends))[0][0])
                    for r in bad.tolist()})
    p("offending units:", units)
    for u in units[:8]:
        show_unit(u)

    # Interpret-mode replay of just these units.
    sel = np.asarray(units, np.int32)
    m2 = jnp.asarray(meta_np[sel])
    pair0 = jnp.zeros((1, pairbuf), jnp.int32)
    t0 = time.time()
    pairs = pc.compact_tokens_pallas(jnp.asarray(vmag_np), m2, pair0,
                                     interpret=True)[0, :npair]
    p("interpret replay", round(time.time() - t0, 1))
    pairs = np.asarray(pairs)
    ok = True
    for u in units:
        a, b = int(starts[u]), int(ends[u])
        wantp = (want_zp[a:b] << 1) | want_sg[a:b]
        gotp = pairs[a:b]
        if not np.array_equal(gotp, wantp):
            i = int(np.nonzero(gotp != wantp)[0][0])
            p(f"unit {u}: INTERPRET ALSO WRONG at rank {a + i} "
              f"got={gotp[i]} want={wantp[i]}")
            ok = False
        else:
            p(f"unit {u}: interpret ok")
    if ok:
        p("=> interpret-mode output is correct: Mosaic/device miscompile")
else:
    p("no TPU dump; showing the largest units instead")
    for u in np.argsort(-nsig_np)[:5]:
        show_unit(int(u))
