"""Tracing / profiling harness.

The reference's observability is three stderr bit-count lines
(encode.c:176,180,230).  The TPU framework adds structured stats
(encoder.encode_with_stats) and, here, two profiling tools:

* :func:`device_trace` — context manager around ``jax.profiler`` producing
  an XPlane/perfetto trace of every XLA/Pallas dispatch in the region.
  Enabled on the CLI with ``DWT_TRACE=<dir>``.
* :class:`StageTimer` — wall-clock stage accounting with explicit device
  syncs, for MP/s breakdowns like benchmarks/profile_stages.py.

These are observation-only: neither changes any numerics or stream bytes.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace of the enclosed region (view with xprof/perfetto,
    or grep the .json for /device:TPU dispatches)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates named wall-clock stage timings.

    ``sync`` forces completion of the given arrays before reading the
    clock (pass every stage output).  Use scalar outputs where possible:
    on relay-attached dev TPUs a full-array sync measures the transport,
    not the stage.
    """

    def __init__(self):
        self.stages: list[tuple[str, float]] = []
        self._t0 = time.perf_counter()

    def mark(self, name: str, *sync):
        import numpy as np

        for x in sync:
            np.asarray(getattr(x, "ravel", lambda: x)()[:1])
        now = time.perf_counter()
        self.stages.append((name, now - self._t0))
        self._t0 = now

    def report(self) -> str:
        total = sum(s for _, s in self.stages)
        lines = [f"{n:28s} {s * 1e3:9.2f} ms ({s / total:5.1%})"
                 for n, s in self.stages]
        lines.append(f"{'total':28s} {total * 1e3:9.2f} ms")
        return "\n".join(lines)
