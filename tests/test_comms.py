"""Communication audit of the multi-chip halo transform (VERDICT r3 #7).

The halo-exchanged DWT's collective traffic has a closed-form ideal
(SURVEY §2.1): per transform level t, the column lifting needs exactly one
active boundary row per direction — 2 ppermutes of w_act * C * 4 bytes —
and the coarse tail is all-gathered once.  These tests pin the COMPILED
collective count and payload bytes to that ideal on the 8-device CPU mesh,
so any future sharding change that silently multiplies comms (extra
redistributions, padded payloads, per-step all_gathers) fails here.
"""

import re

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from dwt_tpu.geometry import compute_pyramid  # noqa: E402
from dwt_tpu.parallel import tiled as pt  # noqa: E402


def _mesh(n=8):
    if len(jax.devices()) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.array(jax.devices()[:n]), ("y",))


def _collectives(txt):
    """[(op, nbytes)] for every collective in a compiled HLO dump."""
    out = []
    for m in re.finditer(r" (collective-permute|all-gather|all-reduce)"
                         r"(?:-start)?\(", txt):
        # shape appears just before the op name: "<id> = s32[1,512,3]{...} op("
        line = txt[txt.rfind("\n", 0, m.start()) + 1 : m.start()]
        sm = re.search(r"(\w+)\[([\d,]*)\]", line)
        if not sm:
            continue
        dtype, dims = sm.group(1), sm.group(2)
        size = int(np.prod([int(d) for d in dims.split(",")])) if dims else 1
        bpe = {"s32": 4, "u32": 4, "s64": 8, "f32": 4, "s8": 1,
               "pred": 1}.get(dtype, 4)
        out.append((m.group(1), size * bpe))
    return out


@pytest.mark.parametrize("wh", [(512, 720), (1920, 1080), (512, 512)])
def test_halo_fwd_collective_budget_is_ideal(wh):
    W, H = wh
    mesh = _mesh()
    pyr = compute_pyramid(W, H)
    n_halo, h_pad = pt._halo_plan(pyr, 8)
    x = jax.device_put(jnp.zeros((h_pad, W, 3), jnp.int32),
                       NamedSharding(mesh, P("y", None, None)))
    txt = jax.jit(lambda x: pt.halo_dwt2d_fwd(x, mesh, pyr)) \
        .lower(x).compile().as_text()
    cols = _collectives(txt)
    cps = [b for op, b in cols if op == "collective-permute"]
    ags = [b for op, b in cols if op == "all-gather"]
    L = pyr.levels
    # Exactly 2 boundary-row exchanges per halo level, each the IDEAL
    # payload: one active row = widths[L-t] * C * 4 bytes.
    assert len(cps) == 2 * n_halo, (len(cps), n_halo)
    want = sorted(pyr.widths[L - t] * 3 * 4 for t in range(n_halo)
                  for _ in range(2))
    assert sorted(cps) == want
    # One all-gather of the coarse tail (HLO reports the gathered output
    # shape: all shards of the padded coarse grid).
    S = 1 << n_halo
    assert len(ags) == 1
    assert ags[0] == (h_pad // S) * pyr.widths[L - n_halo] * 3 * 4
    # Nothing else communicates.
    assert all(op in ("collective-permute", "all-gather") for op, _ in cols)


def test_halo_inv_collective_budget_is_ideal():
    W, H = 512, 720
    mesh = _mesh()
    pyr = compute_pyramid(W, H)
    n_halo, h_pad = pt._halo_plan(pyr, 8)
    x = jax.device_put(jnp.zeros((h_pad, W, 3), jnp.int32),
                       NamedSharding(mesh, P("y", None, None)))
    txt = jax.jit(lambda x: pt.halo_dwt2d_inv(x, mesh, pyr)) \
        .lower(x).compile().as_text()
    cols = _collectives(txt)
    cps = [b for op, b in cols if op == "collective-permute"]
    L = pyr.levels
    assert len(cps) == 2 * n_halo
    want = sorted(pyr.widths[L - t] * 3 * 4 for t in range(n_halo)
                  for _ in range(2))
    assert sorted(cps) == want


def test_halo_total_comms_fraction():
    """Total halo bytes per device are a vanishing fraction of the image:
    sum over levels of 2 rows * W/2^t * C * 4 < 4 * W * C * 4 bytes —
    i.e. O(4 rows) of traffic for an H-row image (H/n_dev rows per chip).
    This is the scaling-efficiency argument for >=80% multi-host targets:
    comms/compute -> 0 as rows-per-device grow."""
    W, H = 1920, 1080
    pyr = compute_pyramid(W, H)
    n_halo, _ = pt._halo_plan(pyr, 8)
    L = pyr.levels
    halo_bytes = sum(2 * pyr.widths[L - t] * 3 * 4 for t in range(n_halo))
    image_bytes_per_dev = (H // 8) * W * 3 * 4
    assert halo_bytes < 4 * W * 3 * 4
    assert halo_bytes / image_bytes_per_dev < 0.04
