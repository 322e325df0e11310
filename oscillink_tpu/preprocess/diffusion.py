"""Screened-diffusion gate preprocessor, TPU-native.

Solves the screened Poisson problem over the anchor graph
(reference: oscillink/preprocess/diffusion.py:35-163):

    (L_sym + gamma I) h = beta * max(0, cos(Y, psi))

and min-max normalizes h to [0, 1] for use as per-node query gates.

TPU-first departures: the graph is the same k-sparse padded structure used by
the lattice, the solve is a single-RHS Jacobi-CG with the gather-SpMV matvec
(the reference's default is a dense O(N^3) LU factorization), and the whole
pipeline is one jitted program.  ``method="direct"`` is honored for small N by
materializing the sparse Laplacian densely; above ``_DENSE_DIRECT_LIMIT`` it
silently upgrades to CG (same answer to solver tolerance, asymptotically
faster).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph import Graph, build_graph, lap_matvec, normalize_rows
from ..ops.solver import cg_solve

__all__ = [
    "compute_diffusion_gates",
    "compute_diffusion_gates_from_graph",
    "compute_diffusion_gates_from_graph_batch",
]

_DENSE_DIRECT_LIMIT = 4096


def _normalize_gates(h: np.ndarray, n: int) -> np.ndarray:
    """Min-max normalize to [0, 1] with the uniform-ones fallback on a
    degenerate spread (shared by both host-side gate functions; the batch
    jit replicates the same semantics per lane on device)."""
    h_min, h_max = float(np.min(h)), float(np.max(h))
    if h_max - h_min < 1e-12:
        return np.ones(n, dtype=np.float32)
    return ((h - h_min) / (h_max - h_min)).astype(np.float32)


@partial(jax.jit, static_argnames=("k", "method"))
def _diffusion_jit(Y, psi, jitter, k, row_cap, beta, gamma, tol, max_iters, method):
    g: Graph = build_graph(Y, k, row_cap=row_cap, jitter=jitter)
    Yn = normalize_rows(Y)
    psi_n = psi / (jnp.linalg.norm(psi) + 1e-12)
    s = beta * jnp.maximum(0.0, Yn @ psi_n)

    if method == "direct":
        n = Y.shape[0]
        # densify L_sym = I - W from the sparse rows (small N only)
        W = jnp.zeros((n, n), dtype=jnp.float32)
        rows = jnp.arange(n)[:, None] * jnp.ones_like(g.idx)
        W = W.at[rows, g.idx].add(g.wn)
        L = jnp.eye(n, dtype=jnp.float32) - W
        M = L + gamma * jnp.eye(n, dtype=jnp.float32)
        h = jnp.linalg.solve(M, s)
    else:
        # Jacobi diagonal of L_sym + gamma I: diag(L) = 1 - wn_ii (self loops
        # never occur in the mutual-kNN graph, so diag(L) = 1)
        M_diag = jnp.ones(Y.shape[0], dtype=jnp.float32) + gamma

        def A_mul(x):
            return lap_matvec(g, x) + gamma * x

        h, _, _ = cg_solve(A_mul, s, x0=None, M_diag=M_diag, tol=tol, max_iters=max_iters)
    return h


@jax.jit
def _diffusion_from_graph_jit(g, Y, psi, beta, gamma, tol, max_iters):
    Yn = normalize_rows(Y)
    psi_n = psi / (jnp.linalg.norm(psi) + 1e-12)
    s = beta * jnp.maximum(0.0, Yn @ psi_n)
    M_diag = jnp.ones(Y.shape[0], dtype=jnp.float32) + gamma

    def A_mul(x):
        return lap_matvec(g, x) + gamma * x

    h, _, _ = cg_solve(A_mul, s, x0=None, M_diag=M_diag, tol=tol, max_iters=max_iters)
    return h


@jax.jit
def _diffusion_from_graph_batch_jit(g, Y, psis, beta, gamma, tol, max_iters):
    """Q screened-Poisson solves over ONE shared graph, vmapped — the batch
    counterpart of `_diffusion_from_graph_jit` with the host-side
    normalize/fallback logic replicated functionally per lane."""
    Yn = normalize_rows(Y)
    M_diag = jnp.ones(Y.shape[0], dtype=jnp.float32) + gamma

    def A_mul(x):
        return lap_matvec(g, x) + gamma * x

    def one(psi):
        psi_n = psi / (jnp.linalg.norm(psi) + 1e-12)
        s = beta * jnp.maximum(0.0, Yn @ psi_n)
        h, _, _ = cg_solve(
            A_mul, s, x0=None, M_diag=M_diag, tol=tol, max_iters=max_iters
        )
        finite = jnp.all(jnp.isfinite(h))
        h_min, h_max = jnp.min(h), jnp.max(h)
        spread = h_max - h_min
        hn = jnp.where(
            spread < 1e-12,
            jnp.ones_like(h),
            (h - h_min) / jnp.maximum(spread, 1e-12),
        )
        return jnp.where(finite, jnp.clip(hn, 0.0, 1.0), jnp.ones_like(h))

    return jax.vmap(one)(psis)


def compute_diffusion_gates_from_graph_batch(
    g: Graph,
    Y_dev: jax.Array,
    psis: np.ndarray,  # [Q, D]
    *,
    beta: float = 1.0,
    gamma: float = 0.1,
    tol: float = 1e-4,
    max_iters: int = 256,
) -> np.ndarray:
    """[Q, N] gates for Q queries over an already-built graph; per-query
    semantics identical to `compute_diffusion_gates_from_graph` (same
    normalize + uniform-ones fallback, applied per lane)."""
    if gamma <= 0:
        raise ValueError("gamma must be > 0 for SPD")
    psis = np.asarray(psis, dtype=np.float32)
    q = int(psis.shape[0])
    n = int(Y_dev.shape[0])
    d = int(Y_dev.shape[1])
    if psis.ndim != 2 or psis.shape[1] != d:
        raise ValueError(f"psis must have shape [Q, {d}], got {psis.shape}")
    try:
        h = np.asarray(
            _diffusion_from_graph_batch_jit(
                g,
                Y_dev,
                jnp.asarray(np.asarray(psis, dtype=np.float32)),
                jnp.float32(beta),
                jnp.float32(gamma),
                jnp.float32(tol),
                jnp.int32(max_iters),
            )
        )
    except Exception:
        return np.ones((q, n), dtype=np.float32)
    return h.astype(np.float32)


def compute_diffusion_gates_from_graph(
    g: Graph,
    Y_dev: jax.Array,
    psi: np.ndarray,
    *,
    beta: float = 1.0,
    gamma: float = 0.1,
    tol: float = 1e-4,
    max_iters: int = 256,
    clamp: bool = True,
) -> np.ndarray:
    """Screened-diffusion gates over an ALREADY-BUILT lattice graph.

    The reference's preprocessor rebuilds its own mutual-kNN graph with its
    own kneighbors (diffusion.py:96-103 — SURVEY.md flags the redundancy);
    this variant fuses with the lattice's existing k-sparse structure, so
    the O(N^2 D) similarity scan is paid once.  Same screened-Poisson
    semantics, CG solve only.  Falls back to uniform ones on numerical
    failure, mirroring `compute_diffusion_gates`."""
    if gamma <= 0:
        raise ValueError("gamma must be > 0 for SPD")
    n = int(Y_dev.shape[0])
    d = int(Y_dev.shape[1])
    psi = np.asarray(psi, dtype=np.float32)
    if psi.shape != (d,):
        # input errors must raise — the blanket numerical fallback below
        # would otherwise silently hand the caller uniform gates
        raise ValueError(f"psi must have shape ({d},), got {psi.shape}")
    try:
        h = np.asarray(
            _diffusion_from_graph_jit(
                g,
                Y_dev,
                jnp.asarray(psi),
                jnp.float32(beta),
                jnp.float32(gamma),
                jnp.float32(tol),
                jnp.int32(max_iters),
            )
        )
        if not np.all(np.isfinite(h)):
            return np.ones(n, dtype=np.float32)
    except Exception:
        return np.ones(n, dtype=np.float32)
    if clamp:
        h = _normalize_gates(h, n)
    return np.clip(h, 0.0, 1.0).astype(np.float32)


def compute_diffusion_gates(
    Y: np.ndarray,
    psi: np.ndarray,
    *,
    kneighbors: int = 6,
    row_cap_val: float = 1.0,
    beta: float = 1.0,
    gamma: float = 0.1,
    similarity: str = "cosine",
    deterministic_k: bool = False,
    neighbor_seed: Optional[int] = None,
    clamp: bool = True,
    method: str = "direct",
    tol: float = 1e-4,
    max_iters: int = 256,
) -> np.ndarray:
    """Compute screened diffusion gates h in [0, 1] for `set_query(psi, gates=h)`.

    Validation and defaults mirror the reference (diffusion.py:35-124); on
    numerical failure returns uniform ones.
    """
    Y = np.asarray(Y)
    psi = np.asarray(psi)
    if Y.ndim != 2:
        raise ValueError("Y must be 2D")
    N, D = Y.shape
    if psi.shape[0] != D:
        raise ValueError("psi dimension mismatch")
    if gamma <= 0:
        raise ValueError("gamma must be > 0 for SPD")
    if kneighbors < 1:
        raise ValueError("kneighbors must be >=1")
    if similarity != "cosine":
        raise ValueError("unsupported similarity metric")

    k_eff = min(int(kneighbors), max(1, N - 1))
    jitter = None
    if neighbor_seed is not None and not deterministic_k:
        if N > _DENSE_DIRECT_LIMIT:
            # the seeded tie-break needs the [N, N] jitter of the dense
            # path; silently ignoring the seed here would diverge from the
            # reference's seed mode without any signal
            raise ValueError(
                f"neighbor_seed requires N <= {_DENSE_DIRECT_LIMIT} in "
                "compute_diffusion_gates (dense jitter path)"
            )
        rng = np.random.default_rng(neighbor_seed)
        jitter = jnp.asarray(rng.uniform(-1e-8, 1e-8, size=(N, N)).astype(np.float32))

    eff_method = method
    if method == "direct" and N > _DENSE_DIRECT_LIMIT:
        eff_method = "cg"

    try:
        h = np.asarray(
            _diffusion_jit(
                jnp.asarray(Y.astype(np.float32)),
                jnp.asarray(psi.astype(np.float32)),
                jitter,
                k_eff,
                jnp.float32(row_cap_val),
                jnp.float32(beta),
                jnp.float32(gamma),
                jnp.float32(tol),
                jnp.int32(max_iters),
                eff_method,
            )
        )
        if not np.all(np.isfinite(h)):
            return np.ones(N, dtype=np.float32)
    except Exception:
        return np.ones(N, dtype=np.float32)

    if clamp:
        h = _normalize_gates(h, N)
    return np.clip(h, 0.0, 1.0).astype(np.float32)
