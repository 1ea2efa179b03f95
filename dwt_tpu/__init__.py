"""dwt_tpu — a TPU-native lossless/progressive wavelet image codec.

From-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C codec (xdsopl/dwt): reversible CDF 5/3 integer lifting, Hilbert-curve
coefficient serialization, bitplane + zero-run + adaptive-VLI entropy
coding, embedded progressive bitstreams with byte-budget truncation —
plus tiled multi-chip scaling the reference never had.

The entropy pipeline is int32 end-to-end (64-bit integer ops are emulated
on TPU — codec/encoder.py:858-866).  The few exact totals that must not
wrap (total stream bits, overflow detection in ``_check_stream_bits``)
are computed as int32 device partial sums and totaled host-side in Python
ints (codec/encoder.py:_bit_partials), so importing this package leaves
global JAX configuration untouched — no process-wide ``jax_enable_x64``
flip that a downstream embedder could observe.
"""

# Persistent compilation cache: CLI invocations are separate processes; the
# first run of a given image geometry compiles, every later process reuses
# the compiled executable from disk.  One directory for ALL entry points
# (runtime/cache.py) — XLA's cache keys include the backend, so CPU test
# artifacts and TPU artifacts coexist.
from .runtime import cache as _cache

_cache.enable()

__version__ = "0.1.0"
