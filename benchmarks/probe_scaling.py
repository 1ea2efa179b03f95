"""Multi-device scaling smoke proxy (VERDICT r3 #7).

Hardware limits: this environment exposes ONE real TPU chip, so true
multi-chip scaling cannot be measured here.  This probe (a) verifies the
halo transform's collective budget on the 8-virtual-device CPU mesh (the
same audit tests/test_comms.py pins as a regression), and (b) measures
8-virtual-device vs 1-device wall clock on CPU as a smoke proxy — virtual
devices share the host's cores, so this measures overhead, not speedup;
the informative number is the comms/compute ratio.

Real-slice harness (when multi-chip hardware is available): run THIS file
under `jax.distributed.initialize()` on each host with DWT_SCALE_REAL=1 —
the same halo_dwt2d_fwd call then shards over the real mesh and the
per-device wall clock vs the 1-device run gives scaling efficiency
directly (target >= 80%, BASELINE.md).
"""

import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

if os.environ.get("DWT_SCALE_REAL") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("DWT_SCALE_REAL") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dwt_tpu.geometry import compute_pyramid
from dwt_tpu.ops.lifting import dwt2d_fwd
from dwt_tpu.parallel import tiled as pt

W, H, C = 1920, 1080, 3
N = 8


def timeit(fn, *args):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) \
        else fn(*args).block_until_ready()
    t0 = time.time()
    for _ in range(N):
        r = fn(*args)
        (r[0] if isinstance(r, tuple) else r).block_until_ready()
    return (time.time() - t0) / N


def main():
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("y",))
    pyr = compute_pyramid(W, H)
    n_halo, h_pad = pt._halo_plan(pyr, n_dev)
    rng = np.random.default_rng(0)
    img = rng.integers(-255, 256, (h_pad, W, C)).astype(np.int32)

    x1 = jnp.asarray(img[:H])
    t1 = timeit(jax.jit(lambda x: dwt2d_fwd(x, pyr)), x1)
    print(f"1-device dwt2d_fwd:      {t1*1e3:8.1f} ms")

    xs = jax.device_put(jnp.asarray(img),
                        NamedSharding(mesh, P("y", None, None)))
    fn = jax.jit(lambda x: pt.halo_dwt2d_fwd(x, mesh, pyr))
    tn = timeit(fn, xs)
    print(f"{n_dev}-device halo_dwt2d_fwd: {tn*1e3:8.1f} ms "
          f"(proxy only on virtual devices)")

    txt = fn.lower(xs).compile().as_text()
    cps = re.findall(r"(\w+)\[([\d,]+)\]\{[^}]*\} collective-permute\(", txt)
    halo_bytes = sum(
        4 * int(np.prod([int(d) for d in dims.split(",")]))
        for _, dims in cps)
    per_dev = (H // n_dev) * W * C * 4
    print(f"collectives: {len(cps)} ppermutes, {halo_bytes} halo bytes "
          f"vs {per_dev} image bytes/device "
          f"({100.0 * halo_bytes / per_dev:.2f}% comms/compute)")


if __name__ == "__main__":
    main()
