"""oscillink_tpu — a TPU-native coherence lattice framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the Oscillink
reference (see /root/reference): given anchor embeddings Y (N x D) and a query
psi, build a mutual-kNN graph, settle the strictly convex coherence energy

    H(U) = lamG ||U - Y||_F^2 + lamC tr(U^T L_sym U)
         + lamQ tr((U - 1 psi^T)^T B (U - 1 psi^T)) + lamP tr(U^T L_path U)

with Jacobi-preconditioned multi-RHS conjugate gradient, and emit deterministic
(optionally HMAC-signed) receipts.

TPU-first design departures from the reference (oscillink/core/*.py):
  * the graph is k-sparse from birth — padded [N, K] neighbor idx/weight arrays,
    never a dense N x N Laplacian;
  * all hot ops (similarity top-k, Laplacian matvec, CG) are jitted XLA /
    Pallas code with static shapes;
  * per-node receipt diagnostics are vectorized edge-parallel reductions rather
    than Python loops;
  * million-node lattices row-shard over a `jax.sharding.Mesh` with ICI
    all-reduces inside each CG iteration (see `oscillink_tpu.parallel`).

Public API mirrors the reference package (oscillink/__init__.py:4-21).
"""

from __future__ import annotations

__version__ = "0.4.3"

from .core.lattice import OscillinkLattice, json_line_logger  # noqa: E402,F401
from .core.perf import compare_perf  # noqa: E402,F401
from .core.provenance import compare_provenance  # noqa: E402,F401
from .core.receipts import verify_receipt, verify_receipt_mode  # noqa: E402,F401
from .preprocess.diffusion import compute_diffusion_gates  # noqa: E402,F401

# Public alias preferred in docs (parity: oscillink/__init__.py:11)
Oscillink = OscillinkLattice

__all__ = [
    "Oscillink",
    "OscillinkLattice",
    "verify_receipt",
    "verify_receipt_mode",
    "compare_perf",
    "compare_provenance",
    "compute_diffusion_gates",
    "json_line_logger",
    "__version__",
]
