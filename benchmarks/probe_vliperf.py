"""Isolated device timing of the VLI order scan (_vli_orders).

Same dump/time split as probe_kperf (the full stage-2 wrapper takes tens
of minutes to compile through the relay; the scan alone is much smaller).
Inputs (tv, tf) come from probe_kperf's dump.  Knobs: DWT_VLI_BLOCK,
DWT_VLI_UNROLL (read by encoder at import).

Usage:  python benchmarks/probe_vliperf.py [W H]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np

W = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
H = int(sys.argv[2]) if len(sys.argv) > 2 else 2160
NPZ = f"/tmp/kperf_{W}x{H}.npz"


def p(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from dwt_tpu.codec import encoder as E
    from dwt_tpu.runtime import cache

    cache.enable()
    z = np.load(NPZ)
    tv = jnp.asarray(z["tv"])
    tf = jnp.asarray(z["tf"])
    padded_T = int(z["padded_T"])
    p(f"loaded; padded_T={padded_T} BLOCK={E.BLOCK} unroll={E._VLI_UNROLL} "
      f"backend={jax.default_backend()}")

    f = jax.jit(lambda tv, tf: jnp.sum(
        E._vli_orders(tv, tf, padded_T), dtype=jnp.int32))
    t0 = time.time()
    int(f(tv, tf))
    p(f"compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    n = 5
    outs = [f(tv, tf) for _ in range(n)]
    for o in outs:
        int(o)
    p(f"vli_orders: {(time.time()-t0)/n*1000:.1f} ms")


if __name__ == "__main__":
    main()
