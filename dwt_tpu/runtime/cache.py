"""Persistent XLA compilation cache.

The codec's stage-2 program is a large graph; compiling it through a
relay-attached TPU backend can take minutes per (geometry, token-bucket)
variant.  JAX's persistent compilation cache turns every repeat compile —
across processes and across bench runs — into a sub-second disk load, so
warm-up cost is paid once per machine, not once per process.  (The
reference has no analog: a C codec compiles ahead of time; this is the
JAX/XLA equivalent of shipping a prebuilt binary.)

Enabled once at package import (dwt_tpu/__init__.py) and re-invoked
(idempotently) by the entry points.  ONE directory rule serves every
process — tests, CLI, bench, entry — so they share warm entries:
``<repo>/warmcache/<platform>`` when the package sits inside a writable
checkout (the dev/bench containers are provisioned fresh each session,
home directory included, so only the repo persists — committed TPU
entries ship the expensive relay-side compiles across sessions, the
JAX/XLA analog of a prebuilt binary), else
``~/.cache/dwt_tpu/jax/<platform>``.  The tag is partitioned by the
requested JAX_PLATFORMS plus, for CPU, a host-ISA fingerprint (CPU AOT
artifacts bake in compile-host features that XLA's own key omits); CPU
partitions are gitignored — only ``axon``/TPU entries are committed.
``DWT_NO_COMPILE_CACHE=1`` disables; ``DWT_TPU_CACHE`` or
``JAX_COMPILATION_CACHE_DIR`` (or an explicit argument) overrides the
location.
"""

from __future__ import annotations

import os


def _default() -> str:
    plat = os.environ.get("JAX_PLATFORMS", "default") or "default"
    tag = plat.replace(",", "_")
    if "cpu" in plat:
        # XLA:CPU AOT artifacts bake in the compile host's ISA features and
        # the cache key does NOT include them — loading another machine's
        # entry warns "could lead to ... SIGILL".  Partition the CPU cache
        # by a fingerprint of the host's feature flags.
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        import hashlib

                        h = hashlib.sha1(line.encode()).hexdigest()[:8]
                        tag = f"{tag}-{h}"
                        break
        except OSError:
            pass
    # The dev/bench environment provisions a FRESH container per driver
    # session (home directory included), so a home-dir cache can never be
    # warm when it matters most — the driver's end-of-round bench.  The
    # repo itself is the only filesystem that persists, so prefer a
    # repo-local cache directory (committed entries ship the expensive
    # relay-side TPU compiles across sessions, the JAX/XLA analog of a
    # prebuilt binary).  Falls back to ~/.cache when the package is not
    # sitting inside a writable checkout.
    pkg_repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    repo_dir = os.path.join(pkg_repo, "warmcache")
    if os.path.isdir(os.path.join(pkg_repo, ".git")) or os.path.isdir(repo_dir):
        try:
            os.makedirs(os.path.join(repo_dir, tag), exist_ok=True)
            return os.path.join(repo_dir, tag)
        except OSError:
            pass
    return os.path.join(os.path.expanduser("~"), ".cache", "dwt_tpu", "jax",
                        tag)


def _package_fingerprint() -> str:
    """sha256 over every .py source of the package (sorted): ANY code edit
    invalidates stored executables — conservative and exactly right for a
    persistent artifact.  This module itself is excluded: the store's own
    plumbing never changes traced programs, and including it would
    invalidate every blob on a cache-layer edit."""
    import hashlib

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    me = os.path.abspath(__file__)
    h = hashlib.sha256()
    for root, _dirs, files in sorted(os.walk(pkg)):
        for f in sorted(files):
            p = os.path.join(root, f)
            if f.endswith(".py") and os.path.abspath(p) != me:
                with open(p, "rb") as fh:
                    h.update(f.encode())
                    h.update(fh.read())
    return h.hexdigest()[:16]


_FP = None


def aot_cached(fn, tag: str, args, shapes=()):
    """Compile ``jax.jit(fn)`` for ``args`` (+ abstract ``shapes``) with an
    EXPLICIT on-disk executable store, bypassing XLA's persistent-cache
    key entirely.

    Motivation (round 5, measured): through the axon relay backend the
    XLA persistent-cache key for large programs changes between SESSIONS
    even with byte-identical code and per-component-stable hashes for
    small programs — every bench run recompiled the ~16-minute stage-2
    programs and wrote fresh 50-80 MB entries.  ``jax.experimental.
    serialize_executable`` round-trips across processes in ~50 ms, so the
    framework keys artifacts ITSELF: sha256 of (package source
    fingerprint, jaxlib version, backend platform_version, tag, arg
    shapes/dtypes).  Committed under warmcache/exec/, these make a fresh
    container start warm regardless of the opaque key's drift.

    Returns a callable (loaded or freshly-compiled executable).  Any
    load/serialize failure falls back to a plain compile (and a plain jit
    as the last resort).
    """
    import hashlib
    import pickle

    import jax

    global _FP
    if _FP is None:
        _FP = _package_fingerprint()
    base = enable()
    jitted = jax.jit(fn)
    # TPU-only: XLA:CPU executables deserialize but then fail at DISPATCH
    # ("Function wrapped_iota not found") — a load that only breaks at
    # runtime.  CPU keeps the plain jit + classic persistent cache (its
    # keys are stable there); the axon backend both needs the store (its
    # keys drift per session) and advertises SerializedExecutable support.
    if jax.devices()[0].platform != "tpu":
        return jitted
    # Kernel-gate envs change the traced program but are not part of the
    # store key; a gated fallback rung (bench triage, selftest configs)
    # must not be served the default-config executable.  Gated processes
    # skip the store (they are rare triage paths; the classic in-session
    # cache still serves them).
    if any(os.environ.get(k) == "1" for k in
           ("DWT_NO_PALLAS", "DWT_NO_ENGINE", "DWT_NO_MXURANK",
            "DWT_STATS_LOOP")) or os.environ.get("DWT_VLI_BLOCK") \
            or os.environ.get("DWT_VLI_UNROLL"):
        return jitted
    lower_args = tuple(args) + tuple(shapes)
    if base is None or os.environ.get("DWT_NO_COMPILE_CACHE") == "1":
        return jitted.lower(*lower_args).compile()
    import numpy as np

    def sig(x):
        return f"{getattr(x, 'dtype', type(x).__name__)}{getattr(x, 'shape', ())}"

    leaves = jax.tree.leaves(lower_args)
    backend = jax.devices()[0].client
    key = hashlib.sha256("|".join(
        [_FP, jax.__version__, backend.platform_version, tag]
        + [sig(x) for x in leaves]).encode()).hexdigest()[:32]
    exec_dir = base + "-exec"  # e.g. warmcache/axon-exec; cpu-*-exec
    # partitions stay gitignored with the rest of the CPU cache
    blob_p = os.path.join(exec_dir, f"{tag.replace('/', '_')}-{key}.bin")
    tree_p = blob_p + ".tree"
    from jax.experimental.serialize_executable import (deserialize_and_load,
                                                       serialize)

    MAGIC_Z = b"DWTZ"  # zlib-compressed blob marker (raw blobs lack it)
    if os.path.exists(blob_p) and os.path.exists(tree_p):
        try:
            import zlib

            with open(blob_p, "rb") as f:
                blob = f.read()
            if blob[:4] == MAGIC_Z:
                blob = zlib.decompress(blob[4:])
            with open(tree_p, "rb") as f:
                in_tree, out_tree = pickle.load(f)
            return deserialize_and_load(blob, in_tree, out_tree)
        except Exception:  # noqa: BLE001 — stale/foreign blob: recompile
            pass
    compiled = jitted.lower(*lower_args).compile()
    try:
        import zlib

        os.makedirs(exec_dir, exist_ok=True)
        blob, in_tree, out_tree = serialize(compiled)
        tmp = blob_p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(MAGIC_Z + zlib.compress(blob, 6))
        os.replace(tmp, blob_p)
        with open(tree_p + ".tmp", "wb") as f:
            pickle.dump((in_tree, out_tree), f)
        os.replace(tree_p + ".tmp", tree_p)
    except Exception:  # noqa: BLE001 — the store is best-effort
        pass
    return compiled


def enable(path: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compilation cache at ``path``
    (default: ~/.cache/dwt_tpu/jax/<platform>, overridable via
    DWT_TPU_CACHE / JAX_COMPILATION_CACHE_DIR).  Returns the directory in
    use, or None when disabled."""
    if os.environ.get("DWT_NO_COMPILE_CACHE") == "1":
        return None
    path = (path or os.environ.get("DWT_TPU_CACHE")
            or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _default())
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took real compile time; the default 1 GiB
        # cap with LRU eviction is fine for a handful of geometries.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        return None
    return path
