"""Multi-host runtime tests: two REAL processes, a coordinator, a global
mesh, and a collective over it (parallel/hosts.py).

The reference is single-process (SURVEY §2.1); our multi-host story is
jax.distributed + the same shard_map programs.  This test spawns two
actual OS processes on the CPU backend, each owning 2 local devices, and
verifies that ``hosts.initialize`` + ``hosts.global_mesh`` produce a
4-device global mesh on which a psum over device-local data returns the
global sum on every process — the exact collective shape the budget
all_gather uses across hosts.
"""

import socket
import subprocess
import sys
import textwrap

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dwt_tpu.parallel import hosts
    pid = int(sys.argv[1]); port = sys.argv[2]
    hosts.initialize(coordinator="localhost:" + port, num_processes=2,
                     process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    mesh = hosts.global_mesh()
    assert mesh.devices.size == 4, mesh.devices
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    import numpy as np
    from jax.experimental import multihost_utils

    # Each process contributes its own rows; psum over the mesh axis must
    # see all four devices' data (cross-process collective over the
    # "DCN" boundary the production budget all_gather crosses).
    x = multihost_utils.host_local_array_to_global_array(
        np.full((2, 4), pid * 10 + 1, np.int32), mesh, P("y", None))
    def f(xb):
        return jax.lax.psum(jnp.sum(xb, dtype=jnp.int32), "y")
    from dwt_tpu.parallel.tiled import _shard_map
    got = _shard_map(f, mesh=mesh, in_specs=P("y", None),
                     out_specs=P())(x)
    total = int(jax.device_get(got))
    # process 0 rows sum to 1*8, process 1 rows to 11*8
    assert total == 8 + 88, total
    print("HOSTS_OK", pid, total, flush=True)
""")


def test_two_process_initialize_and_collective(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": "/root/repo"})
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), port],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err}"
        assert "HOSTS_OK" in out, out


def test_initialize_single_process_noop():
    from dwt_tpu.parallel import hosts

    # Must not touch jax.distributed when there is only one process.
    hosts.initialize(num_processes=1)
