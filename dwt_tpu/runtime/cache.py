"""Persistent XLA compilation cache.

The codec's stage-2 program is a large graph; compiling it through a
relay-attached TPU backend can take minutes per (geometry, token-bucket)
variant.  JAX's persistent compilation cache turns every repeat compile —
across processes and across bench runs — into a sub-second disk load, so
warm-up cost is paid once per machine, not once per process.  (The
reference has no analog: a C codec compiles ahead of time; this is the
JAX/XLA equivalent of shipping a prebuilt binary.)

Enabled by every entry point (bench.py, cli.py, __graft_entry__, tests).
``DWT_NO_COMPILE_CACHE=1`` disables; ``JAX_COMPILATION_CACHE_DIR`` (or an
explicit argument) overrides the location.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(path: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compilation cache at ``path``
    (default: <repo>/.jax_cache, overridable via JAX_COMPILATION_CACHE_DIR).
    Returns the directory in use, or None when disabled."""
    if os.environ.get("DWT_NO_COMPILE_CACHE") == "1":
        return None
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
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
