"""dwt_tpu — a TPU-native lossless/progressive wavelet image codec.

From-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C codec (xdsopl/dwt): reversible CDF 5/3 integer lifting, Hilbert-curve
coefficient serialization, bitplane + zero-run + adaptive-VLI entropy
coding, embedded progressive bitstreams with byte-budget truncation —
plus tiled multi-chip scaling the reference never had.

The entropy pipeline is int32 end-to-end (64-bit integer ops are emulated
on TPU — codec/encoder.py:858-866); x64 is enabled only for the few exact
int64 REDUCTIONS (total stream bits, overflow detection in
``_check_stream_bits``) that must not wrap.  Every array in the package
carries an explicit dtype, so the flip changes no numerics here; it is
process-global, which a downstream embedder can observe as numpy float64
inputs staying f64 — pin your own dtypes or set jax_enable_x64 back after
import if that matters to you.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: CLI invocations are separate processes; the
# first run of a given image geometry compiles, every later process reuses
# the compiled executable from disk.  One directory for ALL entry points
# (runtime/cache.py) — XLA's cache keys include the backend, so CPU test
# artifacts and TPU artifacts coexist.
from .runtime import cache as _cache

_cache.enable()

__version__ = "0.1.0"
