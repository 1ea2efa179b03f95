"""On-device kernel self-test: byte-parity of every kernel configuration
at PRODUCTION constants on small inputs.

Round-2 lesson (VERDICT r2 §weak 2-3): CI runs the Pallas kernels in
interpret mode with shrunken constants, which validates the algorithm but
not the Mosaic lowering — a miscompiled kernel can ship silently and only
surface as a wrong 4K stream inside the bench.  This module closes that
hole: each kernel configuration encodes small images through the REAL
device pipeline (production E/SUBA/window constants — the kernels are
size-generic, so a small image exercises the same lowering) and
byte-compares against the sequential spec model (dwt_tpu/specmodel.py,
itself byte-identical to the reference C encoder per tests/test_specmodel).

Because several gates are read at module import (e.g. pallas_compact.
MXU_RANKS), each configuration runs in a fresh subprocess.  The compile
cache (runtime/cache.py) makes repeat runs cheap.

CLI:  python -m dwt_tpu.selftest [--size WxH] [--configs a,b,...]
Exit 0 = all configurations byte-identical; 1 = failures (named on stdout
as JSON).  bench.py runs this before any 4K work and reports the failing
configuration in its own JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# Ordered narrow -> broad: each adds kernels on top of the previous, so the
# FIRST failing config names the guilty kernel group.
CONFIGS = [
    # everything off: XLA fallbacks only (also the CI-on-CPU semantics)
    ("xla", {"DWT_NO_PALLAS": "1"}),
    # Pallas pack + compact kernels, VPU rank prefix sums, loop stats,
    # XLA gather
    ("kernels", {"DWT_NO_ENGINE": "1", "DWT_NO_MXURANK": "1",
                 "DWT_STATS_LOOP": "1"}),
    # + MXU rank prefix sums in A/B
    ("mxuranks", {"DWT_NO_ENGINE": "1", "DWT_STATS_LOOP": "1"}),
    # + fused single-pass stats
    ("fusedstats", {"DWT_NO_ENGINE": "1"}),
    # + Hilbert gather/scatter engines + MXU transpose (full production)
    ("full", {}),
]
GATE_KEYS = ["DWT_NO_PALLAS", "DWT_NO_ENGINE", "DWT_NO_MXURANK",
             "DWT_STATS_LOOP"]


def _child(size: str) -> int:
    """Encode small images under the ambient gates; compare vs specmodel."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    import numpy as np

    from imagegen import random_image

    from dwt_tpu import specmodel
    from dwt_tpu.codec import encoder
    from dwt_tpu.runtime import cache

    cache.enable()
    w, h = (int(x) for x in size.split("x"))
    rng = np.random.default_rng(11)
    ok = True
    for wh, content, chans in (((w, h), "mixed", 3), ((w - 7, h - 3),
                                                      "noise", 1)):
        img = random_image(rng, wh[0], wh[1], chans, content)
        got = encoder.encode(img)
        want = specmodel.encode(img, gray=chans == 1)
        if got != want:
            n = min(len(got), len(want))
            i = next((k for k in range(n) if got[k] != want[k]), n)
            print(f"  mismatch {wh[0]}x{wh[1]}x{chans}: first-diff byte "
                  f"{i}, len {len(got)} vs {len(want)}", file=sys.stderr)
            ok = False
    return 0 if ok else 1


def run(size: str = "192x160", configs=None, timeout: int = 3000) -> dict:
    """Run each configuration in a subprocess; returns {name: 'ok'|'fail'|
    'timeout'} in config order."""
    results = {}
    for name, gates in CONFIGS:
        if configs and name not in configs:
            continue
        env = {k: v for k, v in os.environ.items() if k not in GATE_KEYS}
        env.update(gates, DWT_SELFTEST_CHILD=size)
        try:
            r = subprocess.run(
                [sys.executable, "-m", "dwt_tpu.selftest"], env=env,
                timeout=timeout,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            results[name] = "ok" if r.returncode == 0 else "fail"
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
        print(f"selftest {name}: {results[name]}", file=sys.stderr,
              flush=True)
    return results


def main() -> int:
    child = os.environ.get("DWT_SELFTEST_CHILD")
    if child:
        return _child(child)
    size, configs = "192x160", None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--size":
            size = args.pop(0)
        elif a == "--configs":
            configs = args.pop(0).split(",")
    results = run(size, configs)
    print(json.dumps(results))
    return 0 if all(v == "ok" for v in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
