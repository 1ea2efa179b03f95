"""Host-side (CPU) work-distribution model for the compaction kernels on
the 4K bench image: per-unit emit counts, rows touched, tier histogram,
and a lane-op cost model for the one-hot placement — tells us where
kernel A's time should go and what a restructure can save."""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "tests")
from imagegen import random_image  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dwt_tpu.codec import encoder  # noqa: E402
from dwt_tpu.codec.encoder import PMAX, _Segs, _detail_q  # noqa: E402
from dwt_tpu.ops import pallas_compact as pc  # noqa: E402

W, H = 3840, 2160
rng = np.random.default_rng(7)
img = random_image(rng, W, H, 3, "mixed")
enc = encoder.get_encoder(W, H, 3)
lin, stats = enc._stage1(jnp.asarray(img), enc._perm)
pyr, C = enc.pyr, 3
segs = _Segs(pyr)

q, pl_, det, valid = _detail_q(lin, segs)
q = np.asarray(q)
valid = np.asarray(valid)
if valid.ndim == 2:
    valid = np.broadcast_to(valid, q.shape)
else:
    valid = np.broadcast_to(valid[None, :], q.shape)
n = segs.n
SUBA = pc.SUBA
E = pc.E

ch_start = np.asarray(segs.ch_start)
ch_len = np.asarray(segs.ch_len)
planes_seg = np.asarray(stats["planes"]) if "planes" in stats else None
print("chunks per channel:", len(ch_start), "n:", n)

rowsig = []   # (unit rows touched, tier rows) pairs
tiers = np.zeros(len(pc.ATIERS) + 1, np.int64)
units = 0
units_big = 0
tot_rows_touched = 0
tot_laneops = 0  # one-hot construct lane-ops (tier_rows * 2*SUBA)
tot_rows_ref = 0
laneops_ref = 0
for c in range(C):
    qc = np.where(valid[c], q[c], -1)
    for k in range(len(ch_start)):
        s, ln = ch_start[k], ch_len[k]
        qk = qc[s:s + E]  # E-aligned chunk (padding has qc = -1)
        qk = qk[:ln] if ln < E else qk
        if qk.size == 0:
            continue
        pmaxk = int(qk.max()) + 1 if qk.size else 0
        for p in range(max(pmaxk, 0)):
            mS = qk == p
            nsig = int(mS.sum())
            mR = qk > p
            if nsig:
                units += 1
                if 2 * nsig > pc.WTOK_SMALL - 192:
                    units_big += 1
                pad = np.zeros(E, bool)
                pad[:qk.size] = mS
                percnt = pad.reshape(-1, SUBA).sum(1)
                touched = percnt > 0
                tot_rows_touched += int(touched.sum())
                n2 = 2 * percnt[touched]
                for v in n2:
                    for i, rows in enumerate(pc.ATIERS):
                        if v <= rows - pc.SUBAL or i == len(pc.ATIERS) - 1:
                            tiers[i] += 1
                            tot_laneops += rows * 2 * SUBA
                            break
            if mR.any():
                pad = np.zeros(E, bool)
                pad[:qk.size] = mR
                tr = int((pad.reshape(-1, SUBA).sum(1) > 0).sum())
                tot_rows_ref += tr
                laneops_ref += tr * pc.BROWS * SUBA

print(f"units with nsig>0: {units} (big-window: {units_big})")
print(f"rows touched (A): {tot_rows_touched}")
print(f"tier histogram {pc.ATIERS}: {tiers[:len(pc.ATIERS)]}")
print(f"one-hot lane-ops (A): {tot_laneops/1e9:.2f} G")
print(f"rows touched (B): {tot_rows_ref}, lane-ops (B): {laneops_ref/1e9:.2f} G")
