"""dwt_tpu — a TPU-native lossless/progressive wavelet image codec.

From-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C codec (xdsopl/dwt): reversible CDF 5/3 integer lifting, Hilbert-curve
coefficient serialization, bitplane + zero-run + adaptive-VLI entropy
coding, embedded progressive bitstreams with byte-budget truncation —
plus tiled multi-chip scaling the reference never had.

The entropy pipeline uses 64-bit integer arithmetic; explicit dtypes are
used throughout so enabling x64 does not change any numerics.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: CLI invocations are separate processes; the
# first run of a given image geometry compiles, every later process reuses
# the compiled executable from disk.
_cache_dir = _os.environ.get("DWT_TPU_CACHE", _os.path.expanduser("~/.cache/dwt_tpu/jax"))
if _cache_dir != "0":
    # Partition by requested platform: CPU test runs and TPU runs must not
    # share AOT artifacts (different machine features).
    _plat = _os.environ.get("JAX_PLATFORMS", "default") or "default"
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.join(_cache_dir, _plat.replace(",", "_")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"
