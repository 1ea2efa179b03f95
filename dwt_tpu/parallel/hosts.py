"""Multi-host process setup for pod-slice runs.

The reference is single-process (SURVEY §2.1: no MPI/NCCL anywhere); this
framework scales across hosts with JAX's standard distributed runtime:
one process per host, `jax.distributed.initialize`, a global mesh over all
devices, and the same `shard_map` programs as single-host — XLA lowers the
halo `ppermute`s and budget `all_gather`s onto ICI within a slice and DCN
across slices.  Failure semantics are JAX's fail-fast (a lost host aborts
the step; the embedded bitstream format itself is the degradation path —
any prefix of any tile remains decodable).
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the multi-host runtime (no-op when single-process).

    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly elsewhere (coordinator = "host:port").
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_name: str = "y"):
    """1-D mesh over every device of every process, row-sharding order."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))
