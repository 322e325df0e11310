"""Native C++ engine: host-side lattice fast path for small N.

Builds `engine.cpp` on first use (g++ -O3, cached next to the source with a
content-hash name) and binds it via ctypes.  See `engine.cpp` for the
runtime rationale: small requests dodge the accelerator's fixed per-request
transfer/sync latency; the TPU keeps the large-N regime.
"""

from .engine import NativeEngine, native_available  # noqa: F401
