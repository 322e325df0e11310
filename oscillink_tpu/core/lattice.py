"""OscillinkLattice — the host-side coherence-lattice container.

API-parity re-design of the reference container (oscillink/core/lattice.py:23-992)
on a TPU-native functional core:

  * all numerics run as jitted XLA programs over a k-sparse padded-neighbor
    graph (`oscillink_tpu.ops`); the dense N x N Laplacian of the reference is
    never materialized;
  * jit caching is keyed on shapes only (N, D, K, path-edge count); lambdas,
    dt, tol, and max_iters are traced scalars, so parameter tuning never
    recompiles;
  * receipt diagnostics (per-node components, null points, chain stats,
    dynamics flows) are edge-parallel device reductions instead of the
    reference's O(N*k) / O(N^2 D) Python loops;
  * device→host traffic is strictly minimized: solver state stays on device,
    diagnostics are registered in a `DeferredFetchGroup` and materialize in
    ONE batched transfer per receipt (on tunneled TPU runtimes each fetch is
    a fixed ~30 ms RPC — see utils/lazy.py);
  * the state signature fingerprints the graph's *generating inputs* (hash of
    Y + build params) instead of fetching the adjacency per call; the exact
    edge-subset fingerprint of the reference (lattice.py:729-744) remains
    available as `adjacency_fingerprint()` for provenance/export.

Receipts and HMAC blocks are wire-compatible with the reference (same
canonical JSON payload structure).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections import OrderedDict, deque
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.coherence import EnergyParams, settle_step, solve_stationary
from ..ops.graph import (
    SIMILARITY_RECALL as _SIM_RECALL,
    Graph,
    build_graph,
    mmr_select,
    normalize_rows,
    resolve_similarity as _resolve_similarity,
)
from ..ops.path import PathGraph, build_path_graph
from ..ops.receipts import (
    bundle_scores,
    chain_edge_stats,
    deltaH_trace,
    dynamics_core,
    null_points_sparse,
    per_node_components,
)
from ..utils.lazy import DeferredFetchGroup, LazyStats
from .receipts import sign_payload, verify_receipt

__all__ = ["OscillinkLattice", "json_line_logger"]

# Above this N the dense [N, N] similarity is not materialized (blocked top-k).
_DENSE_LIMIT = 4096
# Dense adjacency export cap — beyond this, export_state falls back to sparse.
_DENSE_EXPORT_LIMIT = 2048  # above this, exports use the k-sparse pair list (a 20k
# dense JSON export was a 400M-element Python list - VERDICT r1 item 10)
# Y-hash sampling threshold for the graph token (bytes): full hash below,
# strided row-sample above to keep signatures O(ms) at million-node scale.
_FULL_HASH_LIMIT = 128 * 1024 * 1024


# --------------------------------------------------------------------------
# jitted entry points (module level so jax.jit's shape-keyed cache is shared
# across lattice instances)
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k", "similarity"))
def _jit_build_graph(Y, jitter, k, row_cap, similarity="exact"):
    g = build_graph(Y, k, row_cap=row_cap, jitter=jitter, similarity=similarity)
    n_edges = jnp.count_nonzero(g.w > 0)
    return g, n_edges


@partial(jax.jit, static_argnames=("use_jacobi",))
def _jit_settle(g, pg, U, Y, psi, B, lam, opts, x0, use_jacobi):
    # opts packs (dt, tol, max_iters) in one pre-staged device array so a
    # settle call performs ZERO host->device transfers (each is a ~25 ms RPC
    # on tunneled runtimes)
    dt, tol, max_iters = opts[0], opts[1], opts[2].astype(jnp.int32)
    U_plus, iters, res = settle_step(
        g, pg, U, Y, psi, B, lam, dt=dt, tol=tol, max_iters=max_iters, x0=x0,
        use_jacobi=use_jacobi,
    )
    return U_plus, iters, res


@partial(jax.jit, static_argnames=("use_jacobi",), donate_argnums=(2,))
def _jit_settle_donated(g, pg, U, Y, psi, B, lam, opts, x0, use_jacobi):
    """Full-width settle that donates U — the pre-settle state is consumed
    into the CG start vector, freeing one [N, D] block at the 1M single-chip
    HBM margin (pass ``x0=None`` to start from the donated U; a non-None x0
    must be a DISTINCT buffer).  Only routed on TPU at large N: buffer
    donation is a no-op warning on the CPU backend."""
    dt, tol, max_iters = opts[0], opts[1], opts[2].astype(jnp.int32)
    return settle_step(
        g, pg, U, Y, psi, B, lam, dt=dt, tol=tol, max_iters=max_iters, x0=x0,
        use_jacobi=use_jacobi,
    )


@jax.jit
def _jit_solve_ustar(g, pg, Y, psi, B, lam, opts, x0=None):
    tol, max_iters = opts[0], opts[1].astype(jnp.int32)
    Ustar, iters, res = solve_stationary(
        g, pg, Y, psi, B, lam, tol=tol, max_iters=max_iters, x0=x0
    )
    return Ustar, iters, res, res <= tol


@jax.jit
def _jit_solve_ustar_windowed(ctx, Y, psi, B, lam, opts, x0=None):
    from ..models.coherence import solve_stationary_windowed

    tol, max_iters = opts[0], opts[1].astype(jnp.int32)
    Ustar, iters, res = solve_stationary_windowed(
        ctx, Y, psi, B, lam, tol=tol, max_iters=max_iters, x0=x0
    )
    return Ustar, iters, res, res <= tol


@partial(jax.jit, static_argnames=("use_jacobi",))
def _jit_settle_windowed(ctx, U, Y, psi, B, lam, opts, x0, use_jacobi):
    from ..models.coherence import settle_step_windowed

    dt, tol, max_iters = opts[0], opts[1], opts[2].astype(jnp.int32)
    return settle_step_windowed(
        ctx, U, Y, psi, B, lam, dt=dt, tol=tol, max_iters=max_iters, x0=x0,
        use_jacobi=use_jacobi,
    )


@jax.jit
def _jit_solve_ustar_windowed_fused(ctx, Y, psi, B, lam, opts, x0=None):
    """Fused-operator windowed U* solve (router guarantees λ_C ≠ 0)."""
    from ..models.coherence import solve_stationary_windowed_fused

    tol, max_iters = opts[0], opts[1].astype(jnp.int32)
    Ustar, iters, res = solve_stationary_windowed_fused(
        ctx, Y, psi, B, lam, tol=tol, max_iters=max_iters, x0=x0
    )
    return Ustar, iters, res, res <= tol


@partial(jax.jit, static_argnames=("use_jacobi",))
def _jit_settle_windowed_fused(ctx, U, Y, psi, B, lam, opts, x0, use_jacobi):
    """Fused-operator windowed settle (router guarantees dt·λ_C ≠ 0)."""
    from ..models.coherence import settle_step_windowed_fused

    dt, tol, max_iters = opts[0], opts[1], opts[2].astype(jnp.int32)
    return settle_step_windowed_fused(
        ctx, U, Y, psi, B, lam, dt=dt, tol=tol, max_iters=max_iters, x0=x0,
        use_jacobi=use_jacobi,
    )


@jax.jit
def _jit_deltaH(g, pg, U, Ustar, lam, B):
    return deltaH_trace(g, pg, U, Ustar, lam, B)


from ..ops.receipts import deltaH_trace_deterministic as _deltaH_det

_jit_deltaH_det = jax.jit(_deltaH_det)


def _deltaH_deterministic(g, pg, U, Ustar, lam, B):
    """Fixed-order f64-tree deltaH (bit-reproducible across runs, mesh
    layouts, and — on IEEE-f64 backends — bit-identical to the NumPy spec
    `ops.receipts.deltaH_tree_np`).  Chain priors accumulate in sorted-edge
    order, so they are covered too.  x64 is enabled only for this trace."""
    with jax.enable_x64(True):
        return _jit_deltaH_det(g, pg, U, Ustar, lam, B)


@jax.jit
def _jit_locality_order(Y):
    """Rows sorted by leading-principal-direction projection (on device).

    Mutual-kNN neighbors of real (clustered) embeddings concentrate near the
    diagonal under this order — the precondition for the windowed matvec
    kernel (ops/pallas/window_spmv.py). Returns (order, inverse)."""
    Yc = Y - jnp.mean(Y, axis=0, keepdims=True)
    # fixed deterministic start vector (seed-free: shapes decide the program)
    v = jnp.sin(jnp.arange(Y.shape[1], dtype=jnp.float32) + 1.0)
    v = v / (jnp.linalg.norm(v) + 1e-12)

    def body(_, v):
        v = Yc.T @ (Yc @ v)
        return v / (jnp.linalg.norm(v) + 1e-12)

    v = jax.lax.fori_loop(0, 8, body, v)
    order = jnp.argsort(Yc @ v, stable=True).astype(jnp.int32)
    inv = jnp.zeros(Y.shape[0], jnp.int32).at[order].set(
        jnp.arange(Y.shape[0], dtype=jnp.int32)
    )
    return order, inv


@jax.jit
def _jit_receipt_full(g, pg, U, Ustar, lam, B, Y, psi):
    dH = deltaH_trace(g, pg, U, Ustar, lam, B)
    coh, anchor, query = per_node_components(g, Y, Ustar, lam, B, psi)
    nflag, nj, nz, nr = null_points_sparse(g, Ustar, lam.lamC, z_th=3.0)
    return (
        dH,
        jnp.sum(coh),
        jnp.sum(anchor),
        jnp.sum(query),
        nflag,
        nj,
        nz,
        nr,
    )


@partial(jax.jit, static_argnames=("col_chunks",))
def _jit_receipt_full_chunked(g, pg, U, Ustar, lam, B, Y, psi, col_chunks):
    """Column-chunked receipt-full for the HBM-limit regime (observed OOM at
    1M x 768: the deltaH matvec's full-width gather temps plus the
    anchor/query [N, D] temps exceed the chip on top of the resident
    Y/U/U* arguments).  The stationary operator acts per column, so deltaH
    and the anchor/query sums accumulate over D-slices; the edge
    diagnostics are already row-blocked (ops/receipts.py)."""
    from ..ops.receipts import coherence_drop

    from ..ops.path import path_lap_matvec

    n, d = U.shape
    w = d // col_chunks
    k_max = g.k_max

    def lap_seq(X):
        """Pair-sequenced Laplacian matvec: 2 gather temps in flight instead
        of k (the unrolled form's k live [N, w] temps tipped the 1M receipt
        over HBM by ~0.6 GB on top of the resident Y/U/U* arguments).
        Odd k runs the leftover slot as a single sequenced step — full
        unrolling would reintroduce the k-live-temps blow-up exactly when
        k is odd."""

        def one(a, acc):
            i0 = jax.lax.dynamic_index_in_dim(g.idx, a, 1, keepdims=False)
            w0 = jax.lax.dynamic_index_in_dim(g.wn, a, 1, keepdims=False)
            return acc - w0[:, None] * jnp.take(X, i0, axis=0)

        def body(j, acc):
            a = 2 * j
            i0 = jax.lax.dynamic_index_in_dim(g.idx, a, 1, keepdims=False)
            i1 = jax.lax.dynamic_index_in_dim(g.idx, a + 1, 1, keepdims=False)
            w0 = jax.lax.dynamic_index_in_dim(g.wn, a, 1, keepdims=False)
            w1 = jax.lax.dynamic_index_in_dim(g.wn, a + 1, 1, keepdims=False)
            return (
                acc
                - w0[:, None] * jnp.take(X, i0, axis=0)
                - w1[:, None] * jnp.take(X, i1, axis=0)
            )

        acc = jax.lax.fori_loop(0, k_max // 2, body, X)
        if k_max % 2 != 0:
            acc = one(k_max - 1, acc)
        return acc

    def chunk_step(c, carry):
        # fori_loop (not a Python unroll): XLA's scheduler otherwise keeps
        # every chunk's [N, w] temps live at once, which re-OOMs the 1M
        # receipt the chunking exists to fix
        dH, anchor_vec, query_vec = carry
        start = c * w
        diff = jax.lax.dynamic_slice(U, (0, start), (n, w)) - jax.lax.dynamic_slice(
            Ustar, (0, start), (n, w)
        )
        term = lam.lamG * diff + lam.lamC * lap_seq(diff) + lam.lamQ * (
            B[:, None] * diff
        )
        if pg is not None:
            term = term + lam.lamP * path_lap_matvec(pg, diff)
        dH = dH + jnp.sum(diff * term)
        av = jax.lax.dynamic_slice(Ustar, (0, start), (n, w)) - jax.lax.dynamic_slice(
            Y, (0, start), (n, w)
        )
        anchor_vec = anchor_vec + jnp.sum(av * av, axis=1)
        qp = jax.lax.dynamic_slice(Ustar, (0, start), (n, w)) - jax.lax.dynamic_slice(
            psi[None, :], (0, start), (1, w)
        )
        query_vec = query_vec + jnp.sum(qp * qp, axis=1)
        return (dH, anchor_vec, query_vec)

    dH, anchor_vec, query_vec = jax.lax.fori_loop(
        0,
        col_chunks,
        chunk_step,
        (jnp.float32(0.0), jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32)),
    )
    anchor_sum = lam.lamG * jnp.sum(anchor_vec)
    query_sum = jnp.sum(lam.lamQ * B * query_vec)
    coh = coherence_drop(g, Y, Ustar, lam.lamC)
    nflag, nj, nz, nr = null_points_sparse(g, Ustar, lam.lamC, z_th=3.0)
    return dH, jnp.sum(coh), anchor_sum, query_sum, nflag, nj, nz, nr


@jax.jit
def _jit_chain_stats(g, pg, Ustar, Y, lamC, ci, cj):
    return chain_edge_stats(g, pg, Ustar, Y, lamC, ci, cj)


@partial(jax.jit, static_argnames=("kk",))
def _jit_bundle_batch_scores(g, Y, Ustars, psis, lamC, alpha, kk):
    """Vmapped MMR bundle scoring (module-level: a per-call closure would
    re-trace and recompile on every bundle_batch request)."""

    def one(Ustar, psi):
        score, align = bundle_scores(g, Y, Ustar, psi, lamC, alpha)
        picks = mmr_select(normalize_rows(Y), score, kk, lambda_div=0.5)
        return picks, score, align

    return jax.vmap(one)(Ustars, psis)


@partial(jax.jit, static_argnames=("k", "diversify"))
def _jit_bundle(g, Y, Ustar, psi, lamC, alpha, k, diversify=True):
    score, align = bundle_scores(g, Y, Ustar, psi, lamC, alpha)
    if diversify:
        Yn = normalize_rows(Y)
        picks = mmr_select(Yn, score, k, lambda_div=0.5)
    else:
        # pure-relevance rerank mode: top-k by score, no MMR redundancy
        # penalty (measured on the real-text corpus: MMR costs ~0.25
        # nDCG@10 when the consumer wants ranking, not diverse coverage)
        _, picks = jax.lax.top_k(score, k)
        picks = picks.astype(jnp.int32)
    return picks, score, align


@jax.jit
def _jit_dynamics(g, pg, U_prev, U_next, lam, B):
    return dynamics_core(g, pg, U_prev, U_next, lam, B)


def _env_flag(name: str) -> bool:
    return os.getenv(name, "0").strip().lower() in {"1", "true", "yes"}


# Empirical ceiling for `_windowed_fw_est_gb` at which the full-width
# windowed solve is PROVEN to fit one 16 GB chip: the estimate evaluated at
# the measured-fit 500k point is 17.677 GB (fw500k_planstats.json: 8 CG
# blocks 12.29 + one-hot 2.31 + straggler one-hot 0.77 + contrib 1.82 +
# 0.5) and that configuration ran at 376 ms settle (fw500k_lattice.json).
# The raw sum overcounts physical residency (XLA frees/reuses CG blocks
# in-program), so this is a ceiling on the ESTIMATE, not on HBM.
_WINDOWED_FW_DEFAULT_GB = 17.7


def _window_precision_tier() -> str:
    """Active windowed-kernel precision tier (OSCILLINK_WINDOW_PRECISION),
    surfaced in receipt meta so cross-replica signature divergence from
    mismatched env values is diagnosable."""
    from ..ops.pallas.window_spmv import _env_precision

    return _env_precision()


def _fused_windowed_enabled() -> bool:
    """The fused windowed operator is the default; OSCILLINK_WINDOWED_FUSED=0
    restores the unfused kernel + XLA λ-combine/denominator passes."""
    return os.getenv("OSCILLINK_WINDOWED_FUSED", "1").strip().lower() not in {
        "0",
        "false",
        "no",
    }


def _null_cap_env() -> int:
    try:
        return int(os.getenv("OSCILLINK_RECEIPT_NULL_CAP", "0").strip())
    except ValueError:
        return 0


@partial(jax.jit, static_argnames=("cap",))
def _jit_cap_nulls(nflag, nj, nz, nr, cap: int):
    """Device-side top-z selection of flagged null points (see
    ops.receipts.null_points_capped for the rationale)."""
    n_flagged = jnp.sum(nflag.astype(jnp.int32))
    score = jnp.where(nflag, nz, -jnp.inf)
    top_z, top_i = jax.lax.top_k(score, cap)
    return n_flagged, top_i.astype(jnp.int32), nj[top_i], top_z, nr[top_i]


def _maybe_sync(x) -> None:
    """Block for accurate per-phase timings only when profiling is requested.

    Each device sync through a tunneled runtime is a ~27 ms RPC, so the
    default pipeline stays fully asynchronous and syncs exactly once — at the
    batched receipt fetch.  Set OSCILLINK_SYNC_TIMINGS=1 to restore blocking
    per-phase wall-clock timings (graph_build_ms / t_ms / solve_ms then mean
    compute time; otherwise they measure dispatch time).
    """
    if _env_flag("OSCILLINK_SYNC_TIMINGS"):
        jax.block_until_ready(x)


def compute_graph_token(
    y_hash: str, k: int, row_cap: float, deterministic: bool, seed
) -> str:
    """Deterministic fingerprint of the graph's generating inputs — identical
    across backends (JAX / native) for the same inputs, so state signatures
    and bundle-cache keys agree."""
    return hashlib.sha256(
        json.dumps([y_hash, k, float(row_cap), bool(deterministic), seed,
                    "mutual-knn-v1"]).encode()
    ).hexdigest()


def compute_state_sig(
    psi: np.ndarray,
    B: np.ndarray,
    lams: list[float],
    chain_present: bool,
    chain_len: int,
    k: int,
    detk: bool,
    adj_token: str,
) -> str:
    """State signature over rounded query/gates, energy params, chain
    metadata, and the adjacency token (reference lattice.py:729-744)."""
    data = {
        "psi": np.round(psi, 6).tolist(),
        "B": np.round(B, 6).tolist(),
        "lam": lams,
        "chain_present": chain_present,
        "chain_len": chain_len,
        "k": k,
        "detk": detk,
        "adj": adj_token,
    }
    raw = json.dumps(data, sort_keys=True).encode("utf-8")
    return hashlib.sha256(raw).hexdigest()


# Device-staged scalar packs, shared across ALL lattice instances: on tunneled
# runtimes each host->device transfer is a fixed ~25 ms RPC, so repeated
# constructions with the same dt/tol/lambda values must not re-transfer.
# LRU-bounded: the service's adaptive learner samples fresh lambda values on
# every explore request, so unbounded dicts would leak one host entry plus a
# device buffer per distinct tuple under learning-enabled traffic.
_PACK_CACHE_MAX = 512
_SCALAR_PACK_CACHE: "OrderedDict[tuple, jax.Array]" = OrderedDict()
_LAM_PACK_CACHE: "OrderedDict[tuple, EnergyParams]" = OrderedDict()


def _scalar_pack(*vals: float) -> jax.Array:
    key = tuple(float(v) for v in vals)
    arr = _SCALAR_PACK_CACHE.get(key)
    if arr is None:
        arr = jnp.asarray(np.array(key, dtype=np.float32))
        _SCALAR_PACK_CACHE[key] = arr
        while len(_SCALAR_PACK_CACHE) > _PACK_CACHE_MAX:
            _SCALAR_PACK_CACHE.popitem(last=False)
    else:
        _SCALAR_PACK_CACHE.move_to_end(key)
    return arr


def _lam_pack(lamG: float, lamC: float, lamQ: float, lamP: float) -> EnergyParams:
    key = (float(lamG), float(lamC), float(lamQ), float(lamP))
    lam = _LAM_PACK_CACHE.get(key)
    if lam is None:
        lam4 = jnp.asarray(np.array(key, dtype=np.float32))
        lam = EnergyParams(lam4[0], lam4[1], lam4[2], lam4[3])
        _LAM_PACK_CACHE[key] = lam
        while len(_LAM_PACK_CACHE) > _PACK_CACHE_MAX:
            _LAM_PACK_CACHE.popitem(last=False)
    else:
        _LAM_PACK_CACHE.move_to_end(key)
    return lam


class OscillinkLattice:
    """Short-term coherence container with chain priors and receipts.

    Mirrors the reference public surface (lattice.py:23-992): settle /
    solve_Ustar / receipt / chain_receipt / bundle, U*-cache keyed by a state
    signature, export / import, callbacks, logging, signed receipts.
    """

    def __init__(
        self,
        Y: np.ndarray,
        kneighbors: int = 6,
        row_cap_val: float = 1.0,
        lamG: float = 1.0,
        lamC: float = 0.5,
        lamQ: float = 4.0,
        deterministic_k: bool = False,
        neighbor_seed: Optional[int] = None,
        similarity: str = "exact",
        _defer_graph: bool = False,
    ):
        if similarity not in {"auto", "exact", "fast", "fastest", "cluster"}:
            raise ValueError(
                "similarity must be 'auto', 'exact', 'fast', 'fastest' or 'cluster'"
            )
        if isinstance(Y, jax.Array):
            Y = np.asarray(Y)
        if not isinstance(Y, np.ndarray) or Y.ndim != 2:
            raise ValueError("Y must be a 2D array")
        if kneighbors < 1:
            raise ValueError("kneighbors must be >= 1")
        if lamG <= 0:
            raise ValueError("lamG must be > 0 for SPD")
        for name, val in {"lamC": lamC, "lamQ": lamQ}.items():
            if val < 0:
                raise ValueError(f"{name} must be >= 0")

        self.Y: np.ndarray = Y.astype(np.float32).copy()
        self.N, self.D = self.Y.shape
        self._Y_dev = jnp.asarray(self.Y)
        self._U_dev = self._Y_dev
        self._Y_hash = self._hash_anchors(self.Y)
        self._lam_dev: Optional[EnergyParams] = None

        k_eff = min(kneighbors, max(1, self.N - 1))
        self._kneighbors = k_eff
        self._deterministic_k = bool(deterministic_k)
        self._neighbor_seed = neighbor_seed
        self._row_cap_val = float(row_cap_val)
        # "auto" resolves once N is known (recall contract surfaced in
        # receipt meta; resolved mode keys the graph token/cache).  The
        # single-device lattice supports the gated IVF cluster build.
        self._similarity = _resolve_similarity(self.N, similarity, allow_cluster=True)

        self._fetch = DeferredFetchGroup()
        self._settle_callbacks: list[Callable] = []
        self._logger: Optional[Callable[[str, dict], None]] = None

        t0 = time.perf_counter()
        if _defer_graph:
            # import path (from_state/from_npz with a stored adjacency):
            # the caller installs the graph via _set_adjacency_dense —
            # building one from Y here would pay the full similarity scan
            # only to be discarded, and its similarity-mode info would
            # leak into receipt meta describing a graph no longer installed
            self._graph = None  # type: ignore[assignment]
            self._similarity_info = {"mode": "imported"}
            self._similarity = "imported"
        else:
            self._build_graph_device()
        self._graph_build_ms = 1000.0 * (time.perf_counter() - t0)

        self.B_diag = np.ones(self.N, dtype=np.float32)
        self.psi = np.zeros(self.D, dtype=np.float32)
        # created device-side — no host->device transfer
        self._B_dev = jnp.ones(self.N, dtype=jnp.float32)
        self._psi_dev = jnp.zeros(self.D, dtype=jnp.float32)

        self.lamG, self.lamC, self.lamQ = float(lamG), float(lamC), float(lamQ)
        self.lamP = 0.0
        self._path: Optional[PathGraph] = None
        self._chain_nodes: Optional[list[int]] = None
        self.last: Any = {"iters": 0, "res": None, "t_ms": None}

        self._Ustar_cache_dev: Optional[jax.Array] = None
        self._Ustar_cache_host: Optional[np.ndarray] = None
        self._Ustar_sig: Optional[str] = None
        self.stats: dict[str, int] = {"ustar_solves": 0, "ustar_cache_hits": 0}
        self._receipt_secret: Optional[bytes] = None
        self._receipt_secret_kid: Optional[str] = None
        self._signature_mode: str = "minimal"
        self._receipt_detail: str = "full"
        self._last_dynamics: Optional[dict[str, Any]] = None
        self._log(
            "init",
            {
                "N": self.N,
                "D": self.D,
                "kneighbors_requested": kneighbors,
                "kneighbors_effective": k_eff,
                "deterministic_k": self._deterministic_k,
                "neighbor_seed": self._neighbor_seed,
            },
        )

    # -- graph build ------------------------------------------------------

    @staticmethod
    def _hash_anchors(Y: np.ndarray, full: bool = False) -> str:
        """SHA-256 of the anchors (strided row sample above _FULL_HASH_LIMIT).

        ``full=True`` forces an unsampled content hash regardless of size —
        required wherever the hash is a correctness-critical KEY rather than
        a fingerprint (the service graph cache: two corpora differing only
        in rows a stride skips must never collide)."""
        if full or Y.nbytes <= _FULL_HASH_LIMIT:
            return hashlib.sha256(np.ascontiguousarray(Y).tobytes()).hexdigest()
        stride = max(1, Y.shape[0] * Y.shape[1] * 4 // _FULL_HASH_LIMIT)
        h = hashlib.sha256()
        h.update(np.ascontiguousarray(Y[::stride]).tobytes())
        h.update(f"sampled:{stride}:{Y.shape}".encode())
        return h.hexdigest()

    def _build_graph_device(self) -> None:
        # defaults for paths that return before _maybe_build_window_ctx
        self._window_ctx = None
        self._window_coverage = None
        self._window_fullwidth = True
        self._similarity_info = None
        jitter = None
        if self._neighbor_seed is not None and not self._deterministic_k:
            # Seeded tie-break contract (reference graph.py:54-58): jitter is
            # float64 uniform(-1e-8, 1e-8) added to the similarity matrix.
            # In f32 on device the jitter vanishes below the similarity ULP,
            # so the SELECTION runs host-side in f64 for exact neighbor-set
            # parity; weights are the jittered values cast to f32, matching
            # the reference's A assignment (graph.py:59-62).  Holds for ANY N
            # (dense below _DENSE_LIMIT, row-blocked above, hard error above
            # OSCILLINK_SEEDED_MAX_N) — silent seed dropping is worse than a
            # loud limit (VERDICT r1 item 5).
            self._build_graph_seeded_host()
            return
        if self._similarity == "cluster":
            # IVF clustered candidates (ops/ivf.py): ~60x fewer scan FLOPs
            # than the full N^2 pass; overflow- and recall-gated with a
            # silent fallback to the fast scan (info records which ran)
            from ..ops.ivf import build_graph_ivf

            def _compiled_fallback(mode: str):
                # run the fallback as the lattice's single jitted build
                # program (eager module-level build_graph costs minutes of
                # per-op RPC latency through tunneled runtimes)
                g_fb, _ = _jit_build_graph(
                    self._Y_dev,
                    None,
                    self._kneighbors,
                    self._opts(self._row_cap_val)[0],
                    similarity=mode,
                )
                return g_fb

            g, info = build_graph_ivf(
                self._Y_dev,
                self._kneighbors,
                row_cap=self._row_cap_val,
                fallback_builder=_compiled_fallback,
            )
            self._similarity_info = info
            n_edges = jnp.count_nonzero(g.w > 0)
        else:
            g, n_edges = _jit_build_graph(
                self._Y_dev,
                jitter,
                self._kneighbors,
                self._opts(self._row_cap_val)[0],
                similarity=self._similarity,
            )
        _maybe_sync(g.w)
        self._graph = g
        self._edge_count_handle = self._fetch.defer(n_edges)
        # graph token: deterministic fingerprint of the generating inputs —
        # avoids a per-signature device fetch of the adjacency
        token = compute_graph_token(
            self._Y_hash,
            self._kneighbors,
            self._row_cap_val,
            self._deterministic_k,
            self._neighbor_seed,
        )
        if self._similarity != "exact":
            token = hashlib.sha256(
                f"{token}:{self._similarity}".encode()
            ).hexdigest()
        self._graph_token = token
        self._sig_memo = None
        # host mirrors are fetched lazily (one batched transfer) on demand
        self._host_idx: Optional[np.ndarray] = None
        self._host_w: Optional[np.ndarray] = None
        self._host_sqrt_deg: Optional[np.ndarray] = None
        self._edge_pairs_cache: Optional[np.ndarray] = None
        self._maybe_build_window_ctx()

    def _maybe_build_window_ctx(self) -> None:
        """Build the windowed-matvec context when enabled and worthwhile.

        Gated by OSCILLINK_WINDOWED_MATVEC (auto|0|1): 'auto' requires
        N >= OSCILLINK_WINDOWED_MIN_N and plan coverage >=
        OSCILLINK_WINDOWED_MIN_COVERAGE; '1' forces it (tests); '0' disables.

        Everything runs ON DEVICE (locality ordering, plan construction,
        one-hot build); the only device->host traffic is a two-scalar fetch
        of (coverage, straggler count) — a bulk fetch of the [N, K] neighbor
        arrays costs minutes through tunneled runtimes (measured 165 s for
        6.3 MB).  The context never changes results beyond CG solver float
        ordering — receipts stay within solve tolerance of the XLA path."""
        self._window_ctx = None
        self._window_coverage: Optional[float] = None
        mode = os.getenv("OSCILLINK_WINDOWED_MATVEC", "auto").strip().lower()
        if mode in {"0", "off", "false", "no"}:
            return
        forced = mode in {"1", "force", "on", "true"}
        try:
            min_n = int(os.getenv("OSCILLINK_WINDOWED_MIN_N", "32768"))
        except ValueError:
            min_n = 32768
        if not forced and self.N < min_n:
            return
        self._window_fullwidth = True
        fw_required = False
        if not forced and self._auto_col_chunks() > 1:
            # the windowed tier pays ONLY when the solve runs full-width:
            # a column-chunked solve is c sequential CG programs, each
            # re-streaming the whole [N, n_win*W] one-hot per operator
            # apply — measured losing to the low-memory gather path at both
            # chunked scales (500k c=2: 2450 ms settle vs 1479 gather;
            # 1M c=8: 7782 vs 2912 — scale_tpu.json rows_round4 note).
            # BUT `_auto_col_chunks` models the GATHER solver's [N, K, D_c]
            # temps; the windowed solve holds none of those, so its
            # full-width program can fit where the gather model chunks —
            # measured at 500k: production settle 376 ms full-width
            # windowed vs 573 ms routed gather (fw500k_lattice.json).
            # Admit the full-width windowed solve when its own working-set
            # estimate fits the proven budget (`_windowed_fw_budget_gb`,
            # calibrated to that measured-fit point); an EXPLICIT
            # OSCILLINK_COL_CHUNKS keeps operator control and the old skip.
            fw_budget = self._windowed_fw_budget_gb()
            floor_gb = self._windowed_fw_floor_gb()
            if (
                os.getenv("OSCILLINK_COL_CHUNKS", "").strip()
                or fw_budget <= 0.0
                or floor_gb > fw_budget
            ):
                self._log(
                    "window_ctx_skipped",
                    {
                        "reason": "col-chunked solve",
                        "col_chunks": self._auto_col_chunks(),
                        "fw_floor_gb": round(floor_gb, 2),
                    },
                )
                return
            fw_required = True
        try:
            min_cov = float(os.getenv("OSCILLINK_WINDOWED_MIN_COVERAGE", "0.92"))
        except ValueError:
            min_cov = 0.92
        from ..models.coherence import WindowCtx
        from ..ops.pallas.window_spmv import (
            accept_window_plan,
            build_onehot,
            build_window_plan_device,
            lowcov_smax_bound,
        )

        order, inv = _jit_locality_order(self._Y_dev)
        strag_cap = max(1024, (self.N * self._kneighbors) // 10)
        strag_cap = ((strag_cap + 7) // 8) * 8
        # geometry: three 384-row windows with the row block ALIGNED to the
        # window (R = W = 384) — the round-4 sweeps measured this shape best
        # at EVERY scale, so it is the single geometry for all N:
        #   * 125k (the 1M/8 shard): 5.21 ms/apply vs 6.60 at the old R=256
        #     (benchmarks/window_geometry_125k.json)
        #   * 500k: 21.2 ms/apply vs 34.3 for the previous >256k 2-window
        #     (W=512, R=256) shape — the one-hot-HBM rationale for switching
        #     to 2 windows at large N was outweighed by alignment: the first
        #     elected window is the diagonal block itself (coverage 0.9991
        #     vs 0.949, stragglers 3.6k vs 204k)
        #     (benchmarks/window_geometry_500k.json)
        # s_max 384: three aligned windows leave so few stragglers that the
        # tighter per-block cap essentially never rejects on high-coverage
        # corpora (the `fits` check below still guards it)
        win_w, win_r, n_windows, s_max = 384, 384, 3, 384
        lowcov_bound = lowcov_smax_bound()

        def try_plan(s_max, strag_cap):
            plan, cov_dev, n_strag_dev, fits_dev = build_window_plan_device(
                self._graph.idx, self._graph.wn, order, win_w, win_r,
                strag_cap, s_max, n_windows,
            )
            cov, n_strag, fits, off_last = (
                float(v)
                for v in jax.device_get(
                    [cov_dev, n_strag_dev, fits_dev, plan.strag_off[-1]]
                )
            )  # one tiny RPC
            ok, reason = accept_window_plan(
                cov, n_strag, fits, s_max, strag_cap,
                forced=forced, min_cov=min_cov, lowcov_bound=lowcov_bound,
            )
            return plan, cov, n_strag, off_last, ok, reason

        plan, cov, n_strag, off_last, ok, reason = try_plan(s_max, strag_cap)
        self._window_coverage = cov
        if not ok and reason == "straggler overflow" and lowcov_bound > s_max:
            # low-coverage graphs overflow the default 10%-of-edges
            # straggler cap and the tight s_max, yet the kernel still wins
            # when the per-block segments are bounded (the round-5 rule,
            # see `lowcov_smax_bound`): retry once with the bound's DMA
            # window and an untruncatable cap (every edge may straggle;
            # the arrays are ~12 B/edge, right-sized again below)
            s_max = ((lowcov_bound + 127) // 128) * 128
            n_blocks = -(-self.N // win_r)
            strag_cap = (
                (self.N * self._kneighbors + 8 * n_blocks + s_max + 127)
                // 128
            ) * 128
            plan, cov, n_strag, off_last, ok, reason = try_plan(
                s_max, strag_cap
            )
            self._window_coverage = cov
        # the compacted straggler list truncates beyond strag_cap, and the
        # kernel's per-block DMA window is s_max rows — never accept
        # a truncated or non-fitting plan, even when forced (correctness
        # first: accept_window_plan enforces this)
        if not ok:
            self._log(
                "window_ctx_skipped",
                {
                    "coverage": cov,
                    "stragglers": n_strag,
                    "s_max": s_max,
                    "reason": reason,
                },
            )
            return
        if fw_required:
            # the straggler-dependent working-set terms are only known now
            # (post plan fetch): reject when the full estimate exceeds the
            # measured-fit budget — the solve would ResourceExhaust (and a
            # failed attempt leaks device buffers through remote backends)
            est_gb = self._windowed_fw_est_gb(
                int(plan.n_pad), int(off_last), s_max, strag_cap,
                win_w * n_windows,
            )
            if est_gb > self._windowed_fw_budget_gb():
                self._log(
                    "window_ctx_skipped",
                    {
                        "reason": "fw working set",
                        "est_gb": round(est_gb, 2),
                        "budget_gb": self._windowed_fw_budget_gb(),
                        "col_chunks": self._auto_col_chunks(),
                    },
                )
                return
        # forced mode under a chunked solve keeps the chunked-windowed
        # paths (their tests and the OSCILLINK_COL_CHUNKS escape hatch);
        # every other accepted ctx solves full-width
        self._window_fullwidth = fw_required or self._auto_col_chunks() <= 1
        # right-size the straggler arrays: the device builder pads them to
        # strag_cap (N*K/10 rows), but every apply gathers the WHOLE list to
        # build the contribution buffer — at coverage 0.98 that is ~6x more
        # gather than the actual stragglers (measured ~1 ms/apply at 100k).
        # The kernel reads at most strag_off[-1] + s_max rows.
        keep = min(strag_cap, ((int(off_last) + s_max + 127) // 128) * 128)
        if keep < strag_cap:
            plan = plan._replace(
                strag_dst=plan.strag_dst[:keep],
                strag_src=plan.strag_src[:keep],
                strag_w=plan.strag_w[:keep],
            )
        oh = build_onehot(plan, win_w, s_max)
        if _window_precision_tier() in ("oh16", "dma16"):
            # bf16-stored one-hot: halves the per-iteration [Npad, n_win*W]
            # HBM stream (the largest term in the kernel's gap to its
            # streaming bound).  dma16 additionally stores the straggler
            # contribution buffer in bf16 inside the kernel — the dominant
            # stream on low-coverage plans.  Opt-in — quantizes edge
            # weights to bf16, so receipts/state_sig shift ~2e-3; the
            # active tier is already surfaced in receipt meta
            # (window_precision).
            oh = oh._replace(main=oh.main.astype(jnp.bfloat16))
        self._window_ctx = WindowCtx(
            plan=plan,
            oh=oh,
            order=order,
            inv_order=inv,
        )
        self._log(
            "window_ctx",
            {
                "coverage": cov,
                "n_pad": plan.n_pad,
                "stragglers": n_strag,
                "s_max": s_max,
                "accepted": reason,
            },
        )

    def _build_graph_seeded_host(self) -> None:
        """Host f64 build for the seeded-jitter mode (exact reference parity).

        Dense (reference-shaped) below _DENSE_LIMIT; row-blocked above it —
        BLAS row blocks and a sequentially-consumed RNG stream reproduce the
        full-matrix computation bitwise, so neighbor sets match the reference
        at any N.  Above OSCILLINK_SEEDED_MAX_N the build refuses loudly."""
        if self.N > _DENSE_LIMIT:
            self._build_graph_seeded_host_blocked()
            return
        Y = self.Y
        n = self.N
        k = self._kneighbors
        Yn = Y / (np.linalg.norm(Y, axis=1, keepdims=True) + 1e-12)
        S = (Yn @ Yn.T).astype(np.float64)
        np.fill_diagonal(S, -np.inf)
        rng = np.random.default_rng(self._neighbor_seed)
        S = S + rng.uniform(-1e-8, 1e-8, size=S.shape)
        idx = np.argpartition(-S, kth=k, axis=1)[:, :k]
        A = np.zeros((n, n), dtype=np.float32)
        rows = np.arange(n)[:, None]
        A[rows, idx] = np.clip(S[rows, idx].astype(np.float32), 0.0, None)
        M = (A > 0) & (A.T > 0)
        A = np.maximum(A * M, (A * M).T)
        sums = A.sum(axis=1, keepdims=True) + 1e-12
        scale = np.minimum(1.0, self._row_cap_val / sums).astype(np.float32)
        A = (A * np.sqrt(scale * scale.T)).astype(np.float32)
        A = 0.5 * (A + A.T)
        self._set_adjacency_dense(A)
        # token derived from the actual adjacency (seeded builds are
        # data-dependent in a way the input-token scheme can't capture)
        self._graph_token = hashlib.sha256(b"seeded:" + A.tobytes()).hexdigest()
        self._sig_memo = None

    def _build_graph_seeded_host_blocked(self) -> None:
        """Row-blocked seeded selection for N > _DENSE_LIMIT.

        Per block: f32 BLAS similarity (bitwise equal to the reference's
        full-matrix rows), cast to f64, plus the seed's jitter rows drawn
        from ONE sequentially-consumed generator — `uniform(size=(N, N))` is
        row-major, so per-block draws replay the identical stream.  Neighbor
        SETS therefore match reference graph.py:54-62 exactly; the padded
        k-sparse mutual/cap/normalize stage then runs on device
        (`graph_from_topk`, the same math as the dense reference path)."""
        try:
            cap = int(os.getenv("OSCILLINK_SEEDED_MAX_N", "262144"))
        except ValueError:
            cap = 262144
        if self.N > cap:
            raise ValueError(
                f"neighbor_seed at N={self.N} exceeds OSCILLINK_SEEDED_MAX_N="
                f"{cap}: the seeded-jitter contract requires a host-side f64 "
                "O(N^2 D) selection pass. Raise the env cap, drop "
                "neighbor_seed, or use deterministic_k=True."
            )
        n, k = self.N, self._kneighbors
        Yn = self.Y / (np.linalg.norm(self.Y, axis=1, keepdims=True) + 1e-12)
        rng = np.random.default_rng(self._neighbor_seed)
        block = 1024
        vals = np.empty((n, k), dtype=np.float32)
        idx = np.empty((n, k), dtype=np.int32)
        rows_sel = np.arange(block)[:, None]
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            S = (Yn[lo:hi] @ Yn.T).astype(np.float64)
            S += rng.uniform(-1e-8, 1e-8, size=S.shape)
            S[np.arange(hi - lo), np.arange(lo, hi)] = -np.inf
            bi = np.argpartition(-S, kth=k, axis=1)[:, :k]
            idx[lo:hi] = bi.astype(np.int32)
            vals[lo:hi] = S[rows_sel[: hi - lo], bi].astype(np.float32)
        from ..ops.graph import graph_from_topk

        g = jax.jit(partial(graph_from_topk, row_cap=self._row_cap_val))(
            jnp.asarray(vals), jnp.asarray(idx)
        )
        _maybe_sync(g.w)
        self._graph = g
        # DIRECTED slot count, like every other build path — halving here
        # made avg_degree/edge_density 2x smaller on the seeded-blocked
        # path than on the identical graph built without a seed
        self._edge_count_handle = self._fetch.defer(
            jnp.sum((g.w > 0).astype(jnp.int32))
        )
        self._host_idx = None
        self._host_w = None
        self._host_sqrt_deg = None
        self._edge_pairs_cache = None
        self._graph_token = hashlib.sha256(
            b"seeded-blocked:" + idx.tobytes() + vals.tobytes()
        ).hexdigest()
        self._sig_memo = None
        self._maybe_build_window_ctx()

    def _graph_snapshot(self) -> dict:
        """Everything a cache hit must restore to serve over this graph:
        the device-resident Graph, its token, the resolved similarity mode
        + info, the edge count, and the windowed-matvec context (whose plan
        build is itself a measurable cost at large N).  All device arrays
        are immutable jax values — safe to share across lattice instances.
        Used by the service's opt-in graph cache (service/graph_cache.py)."""
        return {
            "graph": self._graph,
            "token": self._graph_token,
            "similarity": self._similarity,
            "similarity_info": self._similarity_info,
            # peek, don't force: _edge_count() would flush ALL pending
            # deferred fetches (a blocking device round-trip) on every
            # cache-enabled MISS; the device scalar re-defers on install
            "n_edges": self._fetch.peek(self._edge_count_handle),
            "window_ctx": self._window_ctx,
            "window_coverage": self._window_coverage,
            "window_fullwidth": getattr(self, "_window_fullwidth", True),
            "kneighbors": self._kneighbors,
            "row_cap": self._row_cap_val,
        }

    def _install_graph_snapshot(self, snap: dict) -> None:
        """Install a `_graph_snapshot` into a `_defer_graph=True` instance —
        the cache-hit constructor path: skips the similarity scan AND the
        window-plan build.  Restores exactly the state
        `_build_graph_device` would have produced for the same inputs (the
        caller guarantees input equality via the cache key)."""
        if snap["kneighbors"] != self._kneighbors or (
            snap["row_cap"] != self._row_cap_val
        ):
            raise ValueError("graph snapshot does not match lattice params")
        if int(snap["graph"].idx.shape[0]) != self.N:
            # shape guard: a cache key collision must fail loudly, never
            # install a graph built for a different corpus shape (ADVICE r4)
            raise ValueError(
                f"graph snapshot row count {int(snap['graph'].idx.shape[0])}"
                f" != lattice N {self.N}"
            )
        self._graph = snap["graph"]
        self._similarity = snap["similarity"]
        self._similarity_info = snap["similarity_info"]
        self._graph_token = snap["token"]
        # snap["n_edges"] may be a still-deferred device scalar (see
        # _graph_snapshot) or an already-resolved host int — defer handles
        # both (device_get of a host int is the int)
        self._edge_count_handle = self._fetch.defer(snap["n_edges"])
        self._window_ctx = snap["window_ctx"]
        self._window_coverage = snap["window_coverage"]
        self._window_fullwidth = snap.get("window_fullwidth", True)
        self._host_idx = None
        self._host_w = None
        self._host_sqrt_deg = None
        self._edge_pairs_cache = None
        self._sig_memo = None
        self._invalidate_cache()

    def _mirrors(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host copies of (idx, w, sqrt_deg) — one batched fetch, cached."""
        if self._host_idx is None:
            g = self._graph
            idx, w, sd = jax.device_get((g.idx, g.w, g.sqrt_deg))
            self._host_idx = np.asarray(idx)
            self._host_w = np.asarray(w)
            self._host_sqrt_deg = np.asarray(sd)
        return self._host_idx, self._host_w, self._host_sqrt_deg

    def _edge_count(self) -> int:
        return int(self._fetch.get(self._edge_count_handle))

    def _edge_pairs(self) -> np.ndarray:
        """Sorted (row-major) [E, 2] int64 nonzero pairs — matches np.argwhere
        order on the dense adjacency (used by fingerprints / export)."""
        if self._edge_pairs_cache is None:
            idx, w, _ = self._mirrors()
            ii, kk = np.nonzero(w > 0)
            jj = idx[ii, kk].astype(np.int64)
            pairs = np.stack([ii.astype(np.int64), jj], axis=1)
            order = np.lexsort((pairs[:, 1], pairs[:, 0]))
            self._edge_pairs_cache = pairs[order]
        return self._edge_pairs_cache

    def adjacency_fingerprint(self) -> str:
        """Exact reference-parity fingerprint: SHA-256 of the first 2048
        row-major nonzero (i, j) pairs (lattice.py:729-732)."""
        nz = self._edge_pairs()[:2048]
        return hashlib.sha256(np.ascontiguousarray(nz).tobytes()).hexdigest()

    def dense_adjacency(self) -> np.ndarray:
        """Reconstruct the dense [N, N] adjacency (export / small-N compat)."""
        idx, w, _ = self._mirrors()
        A = np.zeros((self.N, self.N), dtype=np.float32)
        ii, kk = np.nonzero(w > 0)
        A[ii, idx[ii, kk]] = w[ii, kk]
        return A

    # -- properties -------------------------------------------------------

    @property
    def U(self) -> np.ndarray:
        return np.asarray(self._U_dev)

    @U.setter
    def U(self, value: np.ndarray) -> None:
        self._U_dev = jnp.asarray(np.asarray(value, dtype=np.float32))

    @property
    def sqrt_deg(self) -> np.ndarray:
        return self._mirrors()[2]

    @property
    def graph(self) -> Graph:
        return self._graph

    # -- energy coefficients: attribute-compatible, device-cached ---------
    # Direct assignment (lat.lamQ = 2.0) stays supported; setters invalidate
    # the device-staged coefficient pack so no stale values are used.

    @property
    def lamG(self) -> float:
        return self._lamG_v

    @lamG.setter
    def lamG(self, v: float) -> None:
        self._lamG_v = float(v)
        self._lam_dev = None

    @property
    def lamC(self) -> float:
        return self._lamC_v

    @lamC.setter
    def lamC(self, v: float) -> None:
        self._lamC_v = float(v)
        self._lam_dev = None

    @property
    def lamQ(self) -> float:
        return self._lamQ_v

    @lamQ.setter
    def lamQ(self, v: float) -> None:
        self._lamQ_v = float(v)
        self._lam_dev = None

    @property
    def lamP(self) -> float:
        return self._lamP_v

    @lamP.setter
    def lamP(self, v: float) -> None:
        self._lamP_v = float(v)
        self._lam_dev = None

    def _lam(self) -> EnergyParams:
        if self._lam_dev is None:
            self._lam_dev = _lam_pack(
                self._lamG_v, self._lamC_v, self._lamQ_v, self._lamP_v
            )
        return self._lam_dev

    def _opts(self, *vals: float) -> jax.Array:
        """Device-staged f32 scalar pack, cached globally by value tuple."""
        return _scalar_pack(*vals)

    # -- public API -------------------------------------------------------

    @classmethod
    def from_texts(
        cls,
        texts: list[str],
        query: Optional[str] = None,
        *,
        embed_dim: int = 384,
        model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
        **kwargs,
    ) -> "OscillinkLattice":
        """Build a lattice straight from texts via the embedding adapters
        (sentence-transformers when available, hash fallback otherwise).
        ``query`` embeds and installs as psi when given."""
        from ..adapters.text import embed_texts

        Y = embed_texts(texts, model_name=model_name, fallback_dim=embed_dim)
        lat = cls(Y.astype(np.float32), **kwargs)
        if query is not None:
            psi = embed_texts([query], model_name=model_name, fallback_dim=embed_dim)[0]
            lat.set_query(psi.astype(np.float32))
        return lat

    def set_query(self, psi: np.ndarray, gates: Optional[np.ndarray] = None) -> None:
        psi = np.asarray(psi, dtype=np.float32)
        if psi.shape != (self.D,):
            # a (1, D) slip (forgot [0] on an embedder result) would raise
            # deep in the solver; a (1,) one would broadcast silently wrong
            raise ValueError(f"psi must have shape ({self.D},), got {psi.shape}")
        self.psi = psi.copy()
        if gates is not None:
            if gates.shape[0] != self.N:
                raise ValueError("gates length mismatch N")
            self.B_diag = np.asarray(gates, dtype=np.float32).copy()
            # one batched host->device transfer
            self._psi_dev, self._B_dev = jax.device_put((self.psi, self.B_diag))
        else:
            self._psi_dev = jax.device_put(self.psi)
        self._invalidate_cache()

    def set_gates(self, gates: np.ndarray) -> None:
        if gates.shape[0] != self.N:
            raise ValueError("gates length mismatch N")
        self.B_diag = np.asarray(gates, dtype=np.float32).copy()
        self._B_dev = jnp.asarray(self.B_diag)
        self._invalidate_cache()

    def add_chain(
        self,
        chain: list[int],
        lamP: float = 0.2,
        weights: Optional[list[float]] = None,
    ) -> None:
        if lamP < 0:
            raise ValueError("lamP must be >= 0")
        if any((c < 0 or c >= self.N) for c in chain):
            raise ValueError("chain indices out of bounds")
        if len(chain) < 2:
            raise ValueError("chain must contain at least two indices")
        if weights is not None and len(weights) != len(chain) - 1:
            raise ValueError("weights length must equal len(chain)-1")
        self._path = build_path_graph(self.N, chain, weights)
        self.lamP = float(lamP)
        self._chain_nodes = list(map(int, chain))
        self._invalidate_cache()
        self._log("add_chain", {"length": len(chain), "lamP": lamP})

    def clear_chain(self) -> None:
        self._path = None
        self.lamP = 0.0
        self._chain_nodes = None
        self._invalidate_cache()
        self._log("clear_chain", {})

    def settle(
        self,
        dt: float = 1.0,
        max_iters: int = 12,
        tol: float = 1e-3,
        precond: str = "jacobi",
        *,
        warm_start: bool = True,
        inertia: float = 0.0,
    ) -> dict[str, Any]:
        """Implicit Euler step (I + dt M) U+ = U + dt (lamG Y + lamQ B psi^T).

        Returns the diagnostics dict; its iters/res entries materialize from
        device lazily (batched with the next receipt fetch) unless a logger
        or callback forces them eagerly.
        """
        # only pin the pre-settle U when dynamics will need it — holding a
        # second [N, D] buffer matters at the 1M single-chip margin
        U_prev = self._U_dev if _env_flag("OSCILLINK_RECEIPT_DYNAMICS") else None
        x0 = self._choose_start_x0(warm_start=warm_start, inertia=inertia)
        # U's buffer can be consumed by the solve when nothing else holds it:
        # dynamics retains the pre-settle U, and on a fresh lattice U still
        # aliases Y (donating would delete the anchors, lattice.py:437)
        donate_ok = U_prev is None and self._U_dev is not self._Y_dev
        # The settle is always modeled at TWO resident blocks: its chunk
        # program carries one more live slice than the stationary solve
        # (U chunk + Y chunk + rhs), and the chip agrees — at 1M the c=4
        # settle ResourceExhausted's in EVERY variant (donated distinct-U,
        # probe_chunked_1m; U-aliasing-Y, probe_settle8_1m) while c=8 runs
        # at 2885.5 ms and the ustar c=4 (one fewer slice) runs fine.
        gather_cc = self._auto_col_chunks_gather(2)
        t0 = time.perf_counter()
        if (
            self._window_ctx is not None
            and self._path is None
            and self._auto_col_chunks() > 1
            and not getattr(self, "_window_fullwidth", False)
        ):
            # large-N windowed settle: full-width CG state would exceed HBM
            # (forced-mode/OSCILLINK_COL_CHUNKS path — auto mode only builds
            # the ctx under a chunked model when the full-width working set
            # fits, `_windowed_fw_est_gb`)
            from ..models.coherence import settle_step_windowed_chunked

            U_plus, iters, res = settle_step_windowed_chunked(
                self._window_ctx,
                self._U_dev,
                self._Y_dev,
                self._psi_dev,
                self._B_dev,
                self._lam(),
                dt=self._opts(dt)[0],
                tol=self._opts(tol)[0],
                max_iters=jnp.int32(max_iters),
                x0=x0,
                use_jacobi=precond == "jacobi",
                col_chunks=self._auto_col_chunks(),
                fused=_fused_windowed_enabled()
                and self.lamC != 0.0
                and float(dt) != 0.0,
            )
        elif self._window_ctx is not None and self._path is None:
            settle_fn = (
                _jit_settle_windowed_fused
                if _fused_windowed_enabled()
                and self.lamC != 0.0
                and float(dt) != 0.0
                else _jit_settle_windowed
            )
            U_plus, iters, res = settle_fn(
                self._window_ctx,
                self._U_dev,
                self._Y_dev,
                self._psi_dev,
                self._B_dev,
                self._lam(),
                self._opts(dt, tol, max_iters),
                x0,
                precond == "jacobi",
            )
        elif gather_cc > 1:
            # large-N settle: even the 4-block low-memory CG state exceeds
            # HBM at this (N, resident) point; chunk the embedding columns
            from ..models.coherence import settle_step_chunked

            U_plus, iters, res = settle_step_chunked(
                self._graph,
                self._path,
                self._U_dev,
                self._Y_dev,
                self._psi_dev,
                self._B_dev,
                self._lam(),
                dt=self._opts(dt)[0],
                tol=self._opts(tol)[0],
                max_iters=jnp.int32(max_iters),
                x0=x0,
                use_jacobi=precond == "jacobi",
                col_chunks=gather_cc,
                # U is replaced by the result below; reusing its buffer as
                # the accumulator saves one full-width block at the 1M HBM
                # margin (safety conditions above).
                donate_u=donate_ok,
            )
        elif donate_ok and self.N * self.D * 4 >= 1_000_000_000:
            # large-N full-width settle: consuming U's buffer into the CG
            # start vector is what fits the 4-block state at the 1M margin
            # (TPU-only routing — donation is a no-op warning on CPU)
            U_plus, iters, res = _jit_settle_donated(
                self._graph,
                self._path,
                self._U_dev,
                self._Y_dev,
                self._psi_dev,
                self._B_dev,
                self._lam(),
                self._opts(dt, tol, max_iters),
                # the warm start IS the donated buffer; pass None so
                # settle_step starts from its (donated) U argument
                None if x0 is self._U_dev else x0,
                precond == "jacobi",
            )
            self._U_dev = U_plus  # the old buffer is gone; rebind eagerly
        else:
            U_plus, iters, res = _jit_settle(
                self._graph,
                self._path,
                self._U_dev,
                self._Y_dev,
                self._psi_dev,
                self._B_dev,
                self._lam(),
                self._opts(dt, tol, max_iters),
                x0,
                precond == "jacobi",
            )
        _maybe_sync(U_plus)
        self._U_dev = U_plus
        self.last = LazyStats(
            self._fetch,
            immediate={"t_ms": 1000.0 * (time.perf_counter() - t0)},
            deferred={"iters": iters, "res": res},
            casts={"iters": int, "res": float},
        )
        if self._logger is not None:
            self._log("settle", self.last.to_dict())
            if self.last["res"] > tol * 10:
                self._log(
                    "settle_convergence_warn",
                    {"res": self.last["res"], "tol": tol, "iters": self.last["iters"]},
                )
        if _env_flag("OSCILLINK_RECEIPT_DYNAMICS"):
            try:
                self._last_dynamics = self._compute_dynamics(
                    U_prev, self._U_dev, self.last["iters"]
                )
            except Exception:
                self._last_dynamics = None
        if self._settle_callbacks:
            for cb in list(self._settle_callbacks):
                try:
                    cb(self, self.last)
                except Exception:
                    # reference lattice.py:224-229 swallows; strict mode
                    # (readiness-checklist item) surfaces the failure
                    if _env_flag("OSCILLINK_STRICT_LOGGING"):
                        raise
        return self.last

    def _solve_ustar_device(
        self, tol: float = 1e-4, max_iters: int = 64, use_cache: bool = True
    ) -> jax.Array:
        """U* on device, cache keyed by the state signature; no host fetch."""
        sig = self._signature()
        if use_cache and self._Ustar_cache_dev is not None and self._Ustar_sig == sig:
            self.stats["ustar_cache_hits"] += 1
            self._last_ustar_from_cache = True
            self._log("ustar_cache_hit", {"signature": sig})
            return self._Ustar_cache_dev
        self._last_ustar_from_cache = False

        t0 = time.perf_counter()
        col_chunks = self._auto_col_chunks()
        # gather-path solve: Y resident, plus U when it is a distinct buffer
        # (the fresh-lattice U aliases Y and costs nothing)
        gather_cc = self._auto_col_chunks_gather(
            1 + (1 if self._U_dev is not self._Y_dev else 0)
        )
        # opt-in: start CG from the settled U instead of the reference's
        # x0 = Y (lattice.py:232-263).  The settled state is already near
        # the stationary point, so the solve converges in fewer iterations;
        # the solution is identical within tol (CG endpoint independence of
        # x0) but the iters/res convergence meta will differ from the
        # reference contract — hence the env gate.  Plumbed through every
        # solve path (gather full/chunked and windowed full/chunked).
        ustar_x0 = (
            self._U_dev
            if _env_flag("OSCILLINK_USTAR_WARMSTART")
            and self._U_dev is not self._Y_dev
            else None
        )
        if (
            col_chunks > 1
            and self._window_ctx is not None
            and self._path is None
            and not getattr(self, "_window_fullwidth", False)
        ):
            # large-N windowed solve: no [N, K, D_c] gather temp, so the
            # column chunking only has to cover the CG state blocks
            # (forced-mode/OSCILLINK_COL_CHUNKS path; see the settle twin)
            from ..models.coherence import solve_stationary_windowed_chunked

            Ustar, iters, res = solve_stationary_windowed_chunked(
                self._window_ctx,
                self._Y_dev,
                self._psi_dev,
                self._B_dev,
                self._lam(),
                tol=self._opts(tol)[0],
                max_iters=jnp.int32(max_iters),
                col_chunks=col_chunks,
                x0=ustar_x0,
                fused=_fused_windowed_enabled() and self.lamC != 0.0,
            )
            converged = res <= tol
        elif gather_cc > 1 and (self._window_ctx is None or self._path is not None):
            # chains always solve on the gather path (the windowed kernel has
            # no L_path term), so the chained+windowed case lands here too
            from ..models.coherence import solve_stationary_chunked

            Ustar, iters, res = solve_stationary_chunked(
                self._graph,
                self._path,
                self._Y_dev,
                self._psi_dev,
                self._B_dev,
                self._lam(),
                tol=self._opts(tol)[0],
                max_iters=jnp.int32(max_iters),
                col_chunks=gather_cc,
                x0=ustar_x0,
            )
            converged = res <= tol
        elif self._window_ctx is not None and self._path is None:
            solve_fn = (
                _jit_solve_ustar_windowed_fused
                if _fused_windowed_enabled() and self.lamC != 0.0
                else _jit_solve_ustar_windowed
            )
            Ustar, iters, res, converged = solve_fn(
                self._window_ctx,
                self._Y_dev,
                self._psi_dev,
                self._B_dev,
                self._lam(),
                self._opts(tol, max_iters),
                ustar_x0,
            )
        else:
            Ustar, iters, res, converged = _jit_solve_ustar(
                self._graph,
                self._path,
                self._Y_dev,
                self._psi_dev,
                self._B_dev,
                self._lam(),
                self._opts(tol, max_iters),
                ustar_x0,
            )
        _maybe_sync(Ustar)
        solve_ms = 1000.0 * (time.perf_counter() - t0)
        self.last_ustar = LazyStats(
            self._fetch,
            immediate={"solve_ms": solve_ms},
            deferred={"iters": iters, "res": res, "converged": converged},
            casts={"iters": int, "res": float, "converged": bool},
        )
        if use_cache:
            self._Ustar_cache_dev = Ustar
            self._Ustar_cache_host = None
            self._Ustar_sig = sig
        self.stats["ustar_solves"] += 1
        if self._logger is not None:
            self._log(
                "ustar_solve",
                {
                    "signature": sig,
                    "tol": tol,
                    "max_iters": max_iters,
                    **self.last_ustar.to_dict(),
                },
            )
            if not self.last_ustar["converged"]:
                self._log(
                    "ustar_convergence_warn",
                    {
                        "res": self.last_ustar["res"],
                        "tol": tol,
                        "iters": self.last_ustar["iters"],
                    },
                )
        return Ustar

    def solve_Ustar(
        self,
        tol: float = 1e-4,
        max_iters: int = 64,
        use_cache: bool = True,
    ) -> np.ndarray:
        dev = self._solve_ustar_device(tol=tol, max_iters=max_iters, use_cache=use_cache)
        if use_cache:
            if self._Ustar_cache_host is None:
                self._Ustar_cache_host = np.asarray(dev)
            return self._Ustar_cache_host
        return np.asarray(dev)

    def refresh_Ustar(self, tol: float = 1e-4, max_iters: int = 64) -> np.ndarray:
        self._invalidate_cache()
        self._log("refresh_ustar", {})
        return self.solve_Ustar(tol=tol, max_iters=max_iters, use_cache=True)

    def receipt(self) -> dict[str, Any]:
        from .. import __version__ as pkg_version

        Ustar_dev = self._solve_ustar_device()
        lam = self._lam()
        light = self._receipt_detail == "light"
        if light:
            dH_h = self._fetch.defer(
                _jit_deltaH(
                    self._graph, self._path, self._U_dev, Ustar_dev, lam, self._B_dev
                )
            )
            nulls_full: list[dict[str, Any]] = []
            coh_sum = anchor_sum = query_sum = 0.0
            device_capped: Optional[int] = None
        else:
            cc = self._auto_col_chunks()
            if cc > 1:
                dH_d, coh_d, anchor_d, query_d, nflag, nj, nz, nr = (
                    _jit_receipt_full_chunked(
                        self._graph,
                        self._path,
                        self._U_dev,
                        Ustar_dev,
                        lam,
                        self._B_dev,
                        self._Y_dev,
                        self._psi_dev,
                        col_chunks=cc,
                    )
                )
            else:
                dH_d, coh_d, anchor_d, query_d, nflag, nj, nz, nr = _jit_receipt_full(
                    self._graph,
                    self._path,
                    self._U_dev,
                    Ustar_dev,
                    lam,
                    self._B_dev,
                    self._Y_dev,
                    self._psi_dev,
                )
            dH_h = self._fetch.defer(dH_d)
            coh_h = self._fetch.defer(coh_d)
            anchor_h = self._fetch.defer(anchor_d)
            query_h = self._fetch.defer(query_d)
            device_capped: Optional[int] = None
            cap_pre = _null_cap_env()
            if 0 < cap_pre < self.N:
                # ON-DEVICE top-z capping: at large N nearly every row
                # crosses z_th (z grows with sqrt(N) under the reference's
                # dense-row moments), so fetching four [N] arrays and
                # building N dicts dominates the receipt through a
                # network-attached device.  Only [cap] rows cross the wire.
                cnt_d, ni_d, nj_d, nz_d, nr_d = _jit_cap_nulls(
                    nflag, nj, nz, nr, cap=cap_pre
                )
                nulls_h = [self._fetch.defer(a) for a in (cnt_d, ni_d, nj_d, nz_d, nr_d)]
                self._fetch.flush()
                cnt, ni, njv, nzv, nrv = (
                    self._fetch.get(h, pop=True) for h in nulls_h
                )
                device_capped = int(cnt)
                nulls_full = [
                    {"edge": [int(i), int(j)], "z": float(z), "residual": float(r)}
                    for i, j, z, r in zip(ni, njv, nzv, nrv)
                    if np.isfinite(z)
                ]
            else:
                nulls_h = [self._fetch.defer(a) for a in (nflag, nj, nz, nr)]
                # one batched flush materializes everything registered so far
                self._fetch.flush()
                nflag, nj, nz, nr = (
                    self._fetch.get(h, pop=True) for h in nulls_h
                )
                nulls_full = [
                    {"edge": [int(i), int(j)], "z": float(z), "residual": float(r)}
                    for i, (j, z, r, f) in enumerate(zip(nj, nz, nr, nflag))
                    if f
                ]
            coh_sum = float(self._fetch.get(coh_h, pop=True))
            anchor_sum = float(self._fetch.get(anchor_h, pop=True))
            query_sum = float(self._fetch.get(query_h, pop=True))
        deltaH_mode = "standard"
        if _env_flag("OSCILLINK_DETERMINISTIC_RECEIPTS"):
            dH_det = _deltaH_deterministic(
                self._graph, self._path, self._U_dev, Ustar_dev, lam, self._B_dev
            )
            dH_h = self._fetch.defer(dH_det)
            deltaH_mode = "deterministic-f64-tree"
        dH = float(self._fetch.get(dH_h, pop=True))

        # null-point capping (observability control, lattice.py:334-356)
        cap_val = _null_cap_env()
        if device_capped is not None:
            # cap already applied on device; nulls_full is the z-desc top-cap
            nulls = nulls_full
            null_meta = {
                "total_null_points": device_capped,
                "returned_null_points": len(nulls_full),
                "null_cap_applied": device_capped > len(nulls_full),
            }
        elif cap_val > 0 and len(nulls_full) > cap_val:
            nulls = sorted(nulls_full, key=lambda e: e.get("z", 0.0), reverse=True)[
                :cap_val
            ]
            null_meta = {
                "total_null_points": len(nulls_full),
                "returned_null_points": cap_val,
                "null_cap_applied": True,
            }
        else:
            nulls = nulls_full
            null_meta = {
                "total_null_points": len(nulls_full),
                "returned_null_points": len(nulls_full),
                "null_cap_applied": False,
            }

        last_ustar = getattr(self, "last_ustar", None)
        n_edges = self._edge_count()
        meta: dict[str, Any] = {
            # whether THIS receipt's solve hit the cache — recomputing the
            # membership test here was always True (the solve above had
            # just populated the cache with the current signature)
            "ustar_cached": bool(getattr(self, "_last_ustar_from_cache", False)),
            "ustar_solves": int(self.stats["ustar_solves"]),
            "ustar_cache_hits": int(self.stats["ustar_cache_hits"]),
            "ustar_converged": bool(last_ustar["converged"]) if last_ustar else True,
            "ustar_res": float(last_ustar["res"]) if last_ustar else 0.0,
            "ustar_iters": int(last_ustar["iters"]) if last_ustar else 0,
            "ustar_solve_ms": float(last_ustar["solve_ms"]) if last_ustar else 0.0,
            "graph_build_ms": float(getattr(self, "_graph_build_ms", 0.0)),
            "last_settle_ms": float(self.last.get("t_ms") or 0.0),
            "deltaH_mode": deltaH_mode,
            "avg_degree": float(n_edges / max(self.N, 1)),
            "edge_density": float(n_edges / max(self.N * (self.N - 1), 1)),
            # recall contract of the neighbor scan that built this graph
            # (auditable when similarity="auto" routed to an approx mode)
            "similarity": self._similarity,
            "similarity_recall_target": float(
                _SIM_RECALL.get(self._similarity, 1.0)
            ),
            **(
                {"similarity_info": getattr(self, "_similarity_info", None)}
                if getattr(self, "_similarity_info", None) is not None
                else {}
            ),
            **(
                # active windowed-kernel precision tier: bf16x2/bf16 change
                # settle numerics and therefore state_sig — replicas with
                # differing OSCILLINK_WINDOW_PRECISION produce divergent
                # signatures for identical requests, and this field is how
                # that divergence is diagnosed (ADVICE r4; OPERATIONS.md)
                {"window_precision": _window_precision_tier()}
                if self._window_ctx is not None
                else {}
            ),
            "gates_min": float(np.min(self.B_diag)),
            "gates_max": float(np.max(self.B_diag)),
            "gates_mean": float(np.mean(self.B_diag)),
            "gates_uniform": bool(np.allclose(self.B_diag, self.B_diag[0])),
            "state_sig": self._signature(),
            "receipt_detail": self._receipt_detail,
            "null_points_summary": null_meta,
        }

        if self._receipt_secret is not None:
            if self._signature_mode == "extended":
                payload: dict[str, Any] = {
                    "sig_v": 1,
                    "mode": "extended",
                    "state_sig": self._signature(),
                    "deltaH_total": float(dH),
                    "ustar_iters": meta["ustar_iters"],
                    "ustar_res": meta["ustar_res"],
                    "ustar_converged": meta["ustar_converged"],
                    "params": {
                        "lamG": self.lamG,
                        "lamC": self.lamC,
                        "lamQ": self.lamQ,
                        "lamP": self.lamP,
                    },
                    "graph": {
                        "k": self._kneighbors,
                        "deterministic_k": self._deterministic_k,
                        "neighbor_seed": self._neighbor_seed,
                    },
                }
            else:
                payload = {
                    "sig_v": 1,
                    "mode": "minimal",
                    "state_sig": self._signature(),
                    "deltaH_total": float(dH),
                }
            meta["signature"] = {
                "algorithm": "HMAC-SHA256",
                "payload": payload,
                "signature": sign_payload(payload, self._receipt_secret),
            }
            if self._receipt_secret_kid is not None:
                # key-rotation id (reference PROD_READINESS "multi-secret
                # receipt signing" item): verifiers with a {kid: secret}
                # map pick the right key without trial verification
                meta["signature"]["kid"] = self._receipt_secret_kid

        out: dict[str, Any] = {
            "version": str(pkg_version),
            "deltaH_total": float(dH),
            "coh_drop_sum": float(coh_sum),
            "anchor_pen_sum": float(anchor_sum),
            "query_term_sum": float(query_sum),
            "cg_iters": int(self.last.get("iters") or 0),
            "residual": float(self.last.get("res") or 0.0),
            "t_ms": float(self.last.get("t_ms") or 0.0),
            "null_points": nulls,
            "meta": meta,
        }
        if _env_flag("OSCILLINK_RECEIPT_DYNAMICS") and self._last_dynamics is not None:
            meta["dynamics"] = self._last_dynamics
        self._log(
            "receipt",
            {"deltaH_total": out["deltaH_total"], "ustar_cached": meta["ustar_cached"]},
        )
        return out

    def verify_current_receipt(self, secret: bytes | str) -> bool:
        rec = self.receipt()
        return verify_receipt(rec, secret)

    def chain_receipt(self, chain: list[int], z_th: float = 2.5) -> dict[str, Any]:
        if len(chain) < 2:
            raise ValueError("chain must contain at least two indices")
        if min(chain) < 0 or max(chain) >= self.N:
            # JAX's in-jit gather clamps out-of-bounds indices, which would
            # return confident z-scores for the wrong edge instead of failing
            raise ValueError("chain indices out of bounds")
        Ustar_dev = self._solve_ustar_device()
        pg = self._path if self._path is not None else build_path_graph(self.N, chain)
        ci, cj = jax.device_put(
            (np.array(chain[:-1], dtype=np.int32), np.array(chain[1:], dtype=np.int32))
        )
        outs = _jit_chain_stats(
            self._graph, pg, Ustar_dev, self._Y_dev, self._lam().lamC, ci, cj
        )
        z_s, z_p, r_s, r_p, gains = jax.device_get(outs)
        gain = float(np.sum(gains))

        edges: list[dict[str, Any]] = []
        worst = (-1, -1.0, (-1, -1))
        for a in range(len(chain) - 1):
            i, j = int(chain[a]), int(chain[a + 1])
            edges.append(
                {
                    "k": int(a),
                    "edge": [i, j],
                    "z_struct": float(z_s[a]),
                    "z_path": float(z_p[a]),
                    "r_struct": float(r_s[a]),
                    "r_path": float(r_p[a]),
                }
            )
            zmax = max(float(z_s[a]), float(z_p[a]))
            if zmax > worst[1]:
                worst = (a, zmax, (i, j))

        verdict = all(
            max(float(e["z_struct"]), float(e["z_path"])) <= float(z_th) for e in edges
        )
        return {
            "verdict": bool(verdict),
            "weakest_link": {
                "k": int(worst[0]),
                "edge": [int(worst[2][0]), int(worst[2][1])],
                "zscore": float(worst[1]),
            },
            "coherence_gain": gain,
            "edges": edges,
        }

    def solve_Ustar_batch(
        self,
        psis: np.ndarray,
        gates: Optional[np.ndarray] = None,
        tol: float = 1e-4,
        max_iters: int = 64,
    ) -> np.ndarray:
        """U* for a batch of queries over this lattice's shared graph.

        psis: [Q, D]; gates: optional [Q, N] (default all-ones).  The graph
        build is amortized across the whole batch (models/batched.py) —
        the multi-query serving pattern the per-request reference design
        cannot express.  Returns [Q, N, D].
        """
        from ..models.batched import solve_stationary_batch

        psis = np.asarray(psis, dtype=np.float32)
        if psis.ndim != 2 or psis.shape[1] != self.D:
            raise ValueError("psis must be [Q, D]")
        q = psis.shape[0]
        if gates is None:
            gates_a = np.ones((q, self.N), dtype=np.float32)
        else:
            gates_a = np.asarray(gates, dtype=np.float32)
            if gates_a.shape != (q, self.N):
                raise ValueError("gates must be [Q, N]")
        psis_d, gates_d = jax.device_put((psis, gates_a))
        Ustars, iters, res = solve_stationary_batch(
            self._graph,
            self._Y_dev,
            psis_d,
            gates_d,
            self._lam(),
            tol=self._opts(tol)[0],
            max_iters=jnp.int32(max_iters),
        )
        self._log(
            "ustar_batch",
            {"queries": q, "tol": tol, "max_iters": max_iters},
        )
        return np.asarray(Ustars)

    def bundle_batch(
        self,
        psis: np.ndarray,
        gates: Optional[np.ndarray] = None,
        k: int = 8,
        alpha: float = 0.5,
    ) -> list[list[dict]]:
        """MMR bundles for a batch of queries over the shared graph."""
        from ..models.batched import solve_stationary_batch

        psis = np.asarray(psis, dtype=np.float32)
        q = psis.shape[0]
        if gates is None:
            gates_a = np.ones((q, self.N), dtype=np.float32)
        else:
            gates_a = np.asarray(gates, dtype=np.float32)
        psis_d, gates_d = jax.device_put((psis, gates_a))
        Ustars, _, _ = solve_stationary_batch(
            self._graph, self._Y_dev, psis_d, gates_d, self._lam(),
            tol=self._opts(1e-4)[0], max_iters=jnp.int32(64),
        )
        k_eff = min(max(int(k), 1), self.N)
        picks, scores, aligns = jax.device_get(
            _jit_bundle_batch_scores(
                self._graph,
                self._Y_dev,
                Ustars,
                psis_d,
                self._lam().lamC,
                self._opts(alpha)[0],
                k_eff,
            )
        )
        out = []
        for qi in range(q):
            out.append(
                [
                    {
                        "id": int(i),
                        "score": float(scores[qi][i]),
                        "align": float(aligns[qi][i]),
                    }
                    for i in picks[qi]
                ]
            )
        return out

    def bundle(
        self, k: int = 8, alpha: float = 0.5, *, diversify: bool = True
    ) -> list[dict]:
        """Top-k bundle scored by
        alpha * z(coherence_drop) + (1 - alpha) * cos(U*, psi).

        ``diversify=True`` (the reference contract, lattice.py:530-568)
        MMR-diversifies the picks; ``diversify=False`` returns the pure
        score ranking — the rerank mode, which on the real-text corpus
        ties raw cosine nDCG@10 and beats its recall@5
        (benchmarks/quality_real_lsa_latest.json) where the MMR bundle
        trades ~0.25 nDCG for diversity."""
        Ustar_dev = self._solve_ustar_device()
        k_eff = min(max(int(k), 0), self.N)
        if k_eff == 0:
            return []
        outs = _jit_bundle(
            self._graph,
            self._Y_dev,
            Ustar_dev,
            self._psi_dev,
            self._lam().lamC,
            self._opts(alpha)[0],
            k_eff,
            diversify,
        )
        picks, score, align = jax.device_get(outs)
        return [
            {"id": int(i), "score": float(score[i]), "align": float(align[i])}
            for i in picks
        ]

    def diffusion_gates(
        self,
        psi: Optional[np.ndarray] = None,
        *,
        beta: float = 1.0,
        gamma: float = 0.1,
        tol: float = 1e-4,
        max_iters: int = 256,
        apply: bool = False,
    ) -> np.ndarray:
        """Screened-diffusion gates over THIS lattice's graph.

        The standalone `compute_diffusion_gates` mirrors the reference by
        building its own mutual-kNN graph (reference diffusion.py:96-103);
        this method fuses with the lattice's existing k-sparse structure —
        the similarity scan is paid once.  ``psi`` defaults to the current
        query; ``apply=True`` also installs the gates via `set_gates`."""
        from ..preprocess.diffusion import compute_diffusion_gates_from_graph

        psi_h = self.psi if psi is None else np.asarray(psi, dtype=np.float32)
        h = compute_diffusion_gates_from_graph(
            self._graph,
            self._Y_dev,
            psi_h,
            beta=beta,
            gamma=gamma,
            tol=tol,
            max_iters=max_iters,
        )
        if apply:
            self.set_gates(h)
        return h

    def diffusion_gates_batch(
        self,
        psis: np.ndarray,
        *,
        beta: float = 1.0,
        gamma: float = 0.1,
        tol: float = 1e-4,
        max_iters: int = 256,
    ) -> np.ndarray:
        """[Q, N] screened-diffusion gates for Q queries over THIS lattice's
        graph — one vmapped program, per-query semantics identical to
        `diffusion_gates` (the batch serving path's gate derivation)."""
        from ..preprocess.diffusion import compute_diffusion_gates_from_graph_batch

        return compute_diffusion_gates_from_graph_batch(
            self._graph,
            self._Y_dev,
            np.asarray(psis, dtype=np.float32),
            beta=beta,
            gamma=gamma,
            tol=tol,
            max_iters=max_iters,
        )

    # -- callbacks --------------------------------------------------------

    def add_settle_callback(self, fn) -> None:
        self._settle_callbacks.append(fn)

    def remove_settle_callback(self, fn) -> None:
        try:
            self._settle_callbacks.remove(fn)
        except ValueError:
            pass

    # -- export / import --------------------------------------------------

    def export_state(
        self, include_graph: bool = True, include_chain: bool = True
    ) -> dict[str, Any]:
        from .. import __version__ as pkg_version

        nz = self._edge_pairs()[:2048]
        h = hashlib.sha256()
        h.update(self.Y.tobytes())
        h.update(self.psi.tobytes())
        h.update(self.B_diag.tobytes())
        h.update(
            np.array([self.lamG, self.lamC, self.lamQ, self.lamP], dtype=np.float64).tobytes()
        )
        h.update(np.ascontiguousarray(nz).tobytes())
        state: dict[str, Any] = {
            "version": str(pkg_version),
            "shape": [int(self.N), int(self.D)],
            "params": {
                "lamG": self.lamG,
                "lamC": self.lamC,
                "lamQ": self.lamQ,
                "lamP": self.lamP,
            },
            "Y": self.Y.tolist(),
            "psi": self.psi.tolist(),
            "B_diag": self.B_diag.tolist(),
            "kneighbors": int(self._kneighbors),
            "deterministic_k": bool(self._deterministic_k),
            "neighbor_seed": self._neighbor_seed,
            "provenance": h.hexdigest(),
        }
        if include_graph:
            if self.N <= _DENSE_EXPORT_LIMIT:
                state["A"] = self.dense_adjacency().tolist()
            else:
                pairs = self._edge_pairs()
                vals = self.dense_values_for_pairs(pairs)
                state["A_sparse"] = {
                    "pairs": pairs.tolist(),
                    "values": vals.tolist(),
                }
        if include_chain and self._path is not None:
            edges = []
            src = np.asarray(self._path.src)
            dst = np.asarray(self._path.dst)
            for i, j in zip(src, dst):
                if i < j:
                    edges.append([int(i), int(j)])
            state["chain_edges"] = edges
            if self._chain_nodes is not None:
                state["chain_nodes"] = list(self._chain_nodes)
        return state

    def dense_values_for_pairs(self, pairs: np.ndarray) -> np.ndarray:
        """Adjacency values for sorted (i, j) pairs (sparse export helper)."""
        idx, w, _ = self._mirrors()
        out = np.zeros(len(pairs), dtype=np.float32)
        lookup: dict[tuple[int, int], float] = {}
        ii, kk = np.nonzero(w > 0)
        for i, k in zip(ii, kk):
            lookup[(int(i), int(idx[i, k]))] = float(w[i, k])
        for e, (i, j) in enumerate(pairs):
            out[e] = lookup.get((int(i), int(j)), 0.0)
        return out

    def save_state(
        self,
        path: str,
        format: str = "json",
        include_graph: bool = True,
        include_chain: bool = True,
    ) -> None:
        fmt = format.lower()
        state = self.export_state(include_graph=include_graph, include_chain=include_chain)
        if fmt == "json":
            with open(path, "w", encoding="utf-8") as f:
                json.dump(state, f, sort_keys=True)
        elif fmt == "npz":
            arrays: dict[str, np.ndarray] = {
                "Y": self.Y,
                "psi": self.psi,
                "B_diag": self.B_diag,
            }
            if include_graph and self.N <= _DENSE_EXPORT_LIMIT:
                arrays["A"] = self.dense_adjacency()
            if include_chain and self._chain_nodes is not None:
                arrays["chain_nodes"] = np.array(self._chain_nodes, dtype=np.int32)
            meta = {
                k: v
                for k, v in state.items()
                if k not in {"Y", "psi", "B_diag", "A", "A_sparse", "chain_nodes"}
            }
            archive: dict[str, Any] = {"__meta__": np.array(json.dumps(meta, sort_keys=True))}
            archive.update(arrays)
            np.savez_compressed(path, **archive)
        else:
            raise ValueError("format must be 'json' or 'npz'")

    def save_orbax(self, path: str) -> None:
        """Persist lattice state as an Orbax checkpoint (TPU-native format:
        async-capable, sharded-array aware — the right container for
        million-node lattices where JSON/NPZ round-trips through host RAM)."""
        import orbax.checkpoint as ocp

        state = {
            "Y": self.Y,
            "psi": self.psi,
            "B_diag": self.B_diag,
            "idx": self._mirrors()[0],
            "w": self._mirrors()[1],
            "meta": np.frombuffer(
                json.dumps(
                    {
                        "params": {
                            "lamG": self.lamG,
                            "lamC": self.lamC,
                            "lamQ": self.lamQ,
                            "lamP": self.lamP,
                        },
                        "kneighbors": int(self._kneighbors),
                        "deterministic_k": bool(self._deterministic_k),
                        "neighbor_seed": self._neighbor_seed,
                        "chain_nodes": self._chain_nodes,
                    }
                ).encode(),
                dtype=np.uint8,
            ).copy(),
        }
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state)
        ckptr.wait_until_finished()

    @classmethod
    def from_orbax(cls, path: str) -> "OscillinkLattice":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(os.path.abspath(path))
        meta = json.loads(bytes(np.asarray(state["meta"], dtype=np.uint8)).decode())
        params = meta["params"]
        lat = cls(
            np.asarray(state["Y"], dtype=np.float32),
            kneighbors=meta.get("kneighbors", 6),
            lamG=params.get("lamG", 1.0),
            lamC=params.get("lamC", 0.5),
            lamQ=params.get("lamQ", 4.0),
            deterministic_k=meta.get("deterministic_k", False),
            neighbor_seed=meta.get("neighbor_seed"),
        )
        lat.set_query(
            np.asarray(state["psi"], dtype=np.float32),
            gates=np.asarray(state["B_diag"], dtype=np.float32),
        )
        if meta.get("chain_nodes") and params.get("lamP", 0.0) > 0:
            lat.add_chain(list(meta["chain_nodes"]), lamP=params["lamP"])
        return lat

    @classmethod
    def from_npz(cls, path: str) -> "OscillinkLattice":
        with np.load(path, allow_pickle=False) as data:
            meta = json.loads(str(data["__meta__"]))
            state = {
                **meta,
                "Y": data["Y"].astype(np.float32).tolist(),
                "psi": data["psi"].astype(np.float32).tolist(),
                "B_diag": data["B_diag"].astype(np.float32).tolist(),
            }
            if "A" in data.files:
                state["A"] = data["A"].astype(np.float32).tolist()
            if "chain_nodes" in data.files:
                state["chain_nodes"] = data["chain_nodes"].astype(int).tolist()
        return cls.from_state(state)

    @classmethod
    def from_state(cls, state: dict[str, Any]) -> "OscillinkLattice":
        Y = np.array(state["Y"], dtype=np.float32)
        params = state.get("params", {})
        has_adjacency = "A" in state or "A_sparse" in state
        lat = cls(
            Y,
            kneighbors=state.get("kneighbors", 6),
            lamG=params.get("lamG", 1.0),
            lamC=params.get("lamC", 0.5),
            lamQ=params.get("lamQ", 4.0),
            deterministic_k=state.get("deterministic_k", False),
            neighbor_seed=state.get("neighbor_seed"),
            # a stored adjacency replaces the graph anyway — don't pay the
            # full similarity scan for a build that is discarded
            _defer_graph=has_adjacency,
        )
        psi = np.array(
            state.get("psi", np.zeros(Y.shape[1], dtype=np.float32)), dtype=np.float32
        )
        B = np.array(
            state.get("B_diag", np.ones(Y.shape[0], dtype=np.float32)), dtype=np.float32
        )
        lat.set_query(psi, gates=B)
        if "A" in state:
            A = np.array(state["A"], dtype=np.float32)
            if A.shape == (lat.N, lat.N):
                lat._set_adjacency_dense(A)
        elif "A_sparse" in state:
            pairs = np.array(state["A_sparse"]["pairs"], dtype=np.int64)
            vals = np.array(state["A_sparse"]["values"], dtype=np.float32)
            A = np.zeros((lat.N, lat.N), dtype=np.float32)
            A[pairs[:, 0], pairs[:, 1]] = vals
            lat._set_adjacency_dense(A)
        lamP = params.get("lamP", 0.0)
        if lamP > 0:
            if "chain_nodes" in state:
                lat.add_chain(list(map(int, state["chain_nodes"])), lamP=lamP)
            elif "chain_edges" in state:
                edges = [tuple(map(int, e[:2])) for e in state["chain_edges"]]
                if edges:
                    # reconstruct the PATH ORDER by walking the edge chain:
                    # sorted-unique node ids would build a different
                    # topology (edges [[2,5],[2,9]] from chain [5,2,9]
                    # must not become the path 2-5-9).  Orientation is
                    # irrelevant (L_path is orientation-invariant).
                    adj: dict[int, list[int]] = {}
                    for a_e, b_e in edges:
                        adj.setdefault(a_e, []).append(b_e)
                        adj.setdefault(b_e, []).append(a_e)
                    ends = [v for v, ns in adj.items() if len(ns) == 1]
                    if ends and all(len(ns) <= 2 for ns in adj.values()):
                        walk = [min(ends)]
                        prev = None
                        while len(walk) <= len(edges):
                            nxt = [
                                x for x in adj[walk[-1]] if x != prev
                            ]
                            if not nxt:
                                break
                            prev = walk[-1]
                            walk.append(nxt[0])
                        chain_nodes = walk
                    else:  # branching/cyclic edge set: best-effort order
                        chain_nodes = sorted({i for e in edges for i in e})
                    lat.add_chain(chain_nodes, lamP=lamP)
        if "provenance" in state:
            lat._imported_provenance = state["provenance"]
        return lat

    def _set_adjacency_dense(self, A: np.ndarray) -> None:
        """Install an explicit dense adjacency (import path), converting to the
        padded k-sparse representation and recomputing Laplacian factors."""
        nnz_per_row = (A > 0).sum(axis=1)
        K = max(1, int(nnz_per_row.max()))
        idx = np.zeros((self.N, K), dtype=np.int32)
        w = np.zeros((self.N, K), dtype=np.float32)
        for i in range(self.N):
            js = np.nonzero(A[i] > 0)[0]
            idx[i, : len(js)] = js
            w[i, : len(js)] = A[i, js]
        deg = w.sum(axis=1)
        sqrt_deg = np.sqrt(np.maximum(deg, 1e-12)).astype(np.float32)
        inv = 1.0 / sqrt_deg
        wn = (w * inv[:, None] * inv[idx]).astype(np.float32)
        wn = np.where(w > 0, wn, 0.0).astype(np.float32)
        self._graph = Graph(
            idx=jnp.asarray(idx),
            w=jnp.asarray(w),
            wn=jnp.asarray(wn),
            sqrt_deg=jnp.asarray(sqrt_deg),
        )
        self._host_idx = idx
        self._host_w = w
        self._host_sqrt_deg = sqrt_deg
        self._edge_pairs_cache = None
        self._edge_count_handle = self._fetch.defer(jnp.int32(int((w > 0).sum())))
        self._window_ctx = None
        self._window_coverage = None
        self._graph_token = hashlib.sha256(
            b"imported-dense:" + A.tobytes()
        ).hexdigest()
        self._invalidate_cache()

    # -- internal helpers -------------------------------------------------

    def _signature(self) -> str:
        # memoized until the next state mutation: compute_state_sig
        # JSON-serializes the full [N] gates vector (~100 ms at 1M), and a
        # single receipt() consults the signature several times
        memo = getattr(self, "_sig_memo", None)
        if memo is not None:
            return memo
        sig = compute_state_sig(
            self.psi,
            self.B_diag,
            [self.lamG, self.lamC, self.lamQ, self.lamP],
            self._path is not None,
            len(self._chain_nodes) if self._chain_nodes else 0,
            self._kneighbors,
            self._deterministic_k,
            self._graph_token,
        )
        self._sig_memo = sig
        return sig

    def _windowed_fw_budget_gb(self) -> float:
        """Working-set budget (GB) for admitting the FULL-WIDTH windowed
        solve where the gather model would column-chunk.

        Calibrated to the proven-fit point: the production 500k settle ran
        full-width windowed at 376 ms (vs 573 routed gather) with the
        estimate formula evaluating to ~21 GB on a 16 GB chip — the raw
        sum overcounts because XLA frees/reuses CG blocks in-program, so
        the budget is an EMPIRICAL ceiling on the estimate, not physical
        HBM (`benchmarks/fw500k_lattice.json`, `fw500k_planstats.json`).
        ``OSCILLINK_WINDOWED_FW_GB`` overrides; 0 disables the admission
        (restores the blanket round-4 chunk gate)."""
        raw = os.getenv("OSCILLINK_WINDOWED_FW_GB", "").strip()
        if raw:
            try:
                return float(raw)
            except ValueError:
                pass
        return _WINDOWED_FW_DEFAULT_GB

    def _windowed_fw_floor_gb(self, n_pad: Optional[int] = None) -> float:
        """N-proportional floor of the full-width windowed solve's working
        set: 8 [N, D] f32 CG/resident blocks + the main one-hot stream.
        Cheap pre-filter evaluated BEFORE the window plan is built (the
        straggler terms need the plan; see `_windowed_fw_est_gb`)."""
        block = self.N * self.D * 4 / 1e9
        if n_pad is None:
            n_pad = -(-self.N // 384) * 384
        ohb = 2 if _window_precision_tier() in ("oh16", "dma16") else 4
        return 8 * block + n_pad * 1152 * ohb / 1e9 + 0.5

    def _windowed_fw_est_gb(
        self, n_pad: int, off_last: int, s_max: int, strag_cap: int,
        oh_cols: int,
    ) -> float:
        """Full working-set estimate for the full-width windowed solve,
        evaluated after the plan fetch: floor + straggler one-hot + the
        right-sized contribution buffer (mirrors the `keep` computation
        below)."""
        block = self.N * self.D * 4 / 1e9
        ohb = 2 if _window_precision_tier() in ("oh16", "dma16") else 4
        cb = 2 if _window_precision_tier() == "dma16" else 4
        keep = min(strag_cap, ((off_last + s_max + 127) // 128) * 128)
        return (
            8 * block
            + n_pad * oh_cols * ohb / 1e9
            + n_pad * s_max * 2 / 1e9
            + keep * self.D * cb / 1e9
            + 0.5
        )

    def _auto_col_chunks(self) -> int:
        """Column-chunk the stationary solve when its working set approaches
        HBM (~6 row-blocks of state; docs/SCALING.md memory budget).
        OSCILLINK_COL_CHUNKS overrides (0/1 disables, >1 forces)."""
        raw = os.getenv("OSCILLINK_COL_CHUNKS", "").strip()
        if raw:
            try:
                forced = int(raw)
                if forced > 1 and self.D % forced == 0:
                    return forced
                return 1
            except ValueError:
                return 1
        # auto: the chunk working set (x, r, p, z, Ap, rhs + slices/temps,
        # ~8 f32 row-blocks at D/c) must fit the HBM budget left after the
        # RESIDENT full-width buffers (Y, U, result accumulator — 3 blocks;
        # ignoring them OOM'd the 1M chunked settle: 9.2 GB resident leaves
        # under 5 GB for chunk state on a 16 GB chip)
        block_gb = self.N * self.D * 4 / 1e9
        budget = max(2.0, 14.0 - 3 * block_gb)
        for c in (1, 2, 4, 8, 16):
            if self.D % c == 0 and block_gb * 8 / c <= budget:
                return c
        return 16 if self.D % 16 == 0 else (8 if self.D % 8 == 0 else 1)

    def _auto_col_chunks_gather(self, resident_blocks: int) -> int:
        """Column-chunk count for the XLA-gather settle / U* solves.

        Tighter than `_auto_col_chunks` (which models the pre-round-3 solver
        and still governs the windowed solves and receipts): with the
        row-blocked k-loop matvec (ops/graph.py lap_matvec, ~0.4 GB bounded
        gather temps) and the fused low-memory CG (ops/solver.py
        cg_solve_lowmem) the solve working set is 5 row-blocks — x, r, p,
        Ap, and the solution OUTPUT, which stays un-aliased: input->output
        donation is NOT honored through the axon remote-compile backend
        (benchmarks/probe_alias_1m.py: the 4-block program runs with a
        scalar output, 1111.6 ms/5 iters at 1M, and is compile-rejected the
        moment the full [N, D] solution is returned — donated or not).
        Chunked solves additionally hold the accumulator and the per-chunk
        input slice.  The 12.5 ceiling is EMPIRICAL — it reproduces the
        16 GB-chip observations (est by this formula -> outcome):
        500k full-width 9.7/11.3 ran (486/576 ms, probe_lowmem3); 1M U*
        c=4 resident-1 11.3 ran (2565 ms); 1M c=4 resident-2 14.4 and 1M
        c=2 15.9 compile-rejected (probe_chunked_1m); 1M settle c=8
        resident-2 12.07 ran (2885 ms, probe_settle8_1m) — the compiler
        reserves ~3 GB beyond the raw buffer arithmetic (carry
        double-buffering).  The settle caller always passes
        ``resident_blocks=2``: its chunk program holds one extra live
        slice, and the 1M settle c=4 fails in every variant (donated or
        U-aliasing-Y) while the one-fewer-slice U* c=4 runs.

        ``resident_blocks`` counts the caller's live full-width [N, D]
        buffers during the solve (Y, plus U when distinct).
        """
        raw = os.getenv("OSCILLINK_COL_CHUNKS", "").strip()
        if raw:
            try:
                forced = int(raw)
                if forced > 1 and self.D % forced == 0:
                    return forced
                return 1
            except ValueError:
                return 1
        block_gb = self.N * self.D * 4 / 1e9
        graph_gb = 3 * self.N * self._kneighbors * 4 / 1e9
        for c in (1, 2, 4, 8, 16):
            if self.D % c != 0:
                continue
            if c == 1:
                # x, r, p, Ap + un-aliased output
                working = 5 * block_gb
                extra = 0.0
            else:
                # per-chunk x, r, p, Ap, output + input slice; plus the
                # full-width accumulator
                working = 6 * block_gb / c
                extra = block_gb
            est = (
                resident_blocks * block_gb
                + extra
                + working
                + 0.45  # bounded k-loop gather temps + scalar state
                + graph_gb
            )
            if est <= 12.5:
                return c
        return 16 if self.D % 16 == 0 else (8 if self.D % 8 == 0 else 1)

    def _invalidate_cache(self) -> None:
        self._Ustar_cache_dev = None
        self._Ustar_cache_host = None
        self._Ustar_sig = None
        self._sig_memo = None
        self._log("invalidate_cache", {})

    def _choose_start_x0(self, *, warm_start: bool, inertia: float) -> jax.Array:
        if not warm_start:
            return self._Y_dev
        w = float(max(0.0, min(1.0, inertia)))
        if w <= 0.0:
            return self._U_dev
        return (1.0 - w) * self._Y_dev + w * self._U_dev

    def rebuild_graph(
        self,
        *,
        row_cap_val: Optional[float] = None,
        kneighbors: Optional[int] = None,
        deterministic_k: Optional[bool] = None,
        neighbor_seed: Optional[int] = None,
        similarity: Optional[str] = None,
    ) -> None:
        if similarity is not None:
            if similarity not in {"auto", "exact", "fast", "fastest", "cluster"}:
                raise ValueError(
                    "similarity must be 'auto', 'exact', 'fast', 'fastest' "
                    "or 'cluster'"
                )
            self._similarity = _resolve_similarity(self.N, similarity, allow_cluster=True)
        if row_cap_val is not None:
            self._row_cap_val = float(row_cap_val)
        if kneighbors is not None:
            self._kneighbors = min(int(kneighbors), max(1, self.N - 1))
        if deterministic_k is not None:
            self._deterministic_k = bool(deterministic_k)
        if neighbor_seed is not None:
            self._neighbor_seed = neighbor_seed
        t0 = time.perf_counter()
        self._build_graph_device()
        self._graph_build_ms = 1000.0 * (time.perf_counter() - t0)
        self._invalidate_cache()
        self._log(
            "rebuild_graph",
            {
                "k": int(self._kneighbors),
                "row_cap_val": float(self._row_cap_val),
                "deterministic_k": self._deterministic_k,
                "neighbor_seed": self._neighbor_seed,
            },
        )

    # -- dynamics ---------------------------------------------------------

    def _compute_dynamics(
        self, U_prev: jax.Array, U_next: jax.Array, iters: int
    ) -> dict[str, Any]:
        outs = _jit_dynamics(
            self._graph, self._path, U_prev, U_next, self._lam(), self._B_dev
        )
        move2, dH_d, ftotal, fvals, fi, fj = jax.device_get(outs)
        dH_step = float(dH_d)
        viscosity_step = float(iters) / (abs(dH_step) + 1e-12)
        temperature = float(np.mean(move2)) if move2.size else 0.0

        flows = [
            {"edge": [int(i), int(j)], "flow": float(v)}
            for v, i, j in zip(fvals, fi, fj)
            if v > 0.0
        ]

        inf = np.sqrt(move2 + 1e-12)
        if inf.size == 0 or float(np.max(inf)) <= 1e-9:
            radius = 0
        else:
            thr = 0.1 * float(np.max(inf))
            seeds = [int(i) for i in np.where(inf >= thr)[0].tolist()]
            radius = self._bfs_radius(seeds)

        return {
            "temperature": temperature,
            "step_deltaH": dH_step,
            "viscosity_step": viscosity_step,
            "flow_total": float(ftotal),
            "top_flows": flows,
            "radius": int(radius),
            "move2_mean": float(np.mean(move2) if move2.size else 0.0),
            "move2_max": float(np.max(move2) if move2.size else 0.0),
        }

    def _bfs_radius(self, seeds: list[int]) -> int:
        if not seeds:
            return 0
        idx, w, _ = self._mirrors()
        visited = np.full(self.N, False)
        dist = np.full(self.N, -1, dtype=int)
        q: deque[int] = deque()
        for s in seeds:
            if 0 <= s < self.N and not visited[s]:
                visited[s] = True
                dist[s] = 0
                q.append(s)
        valid = w > 0
        while q:
            u = q.popleft()
            for slot in np.nonzero(valid[u])[0]:
                v = int(idx[u, slot])
                if not visited[v]:
                    visited[v] = True
                    dist[v] = dist[u] + 1
                    q.append(v)
        return int(np.max(dist)) if np.any(dist >= 0) else 0

    # -- logging / signing config -----------------------------------------

    def set_logger(self, logger_callable) -> None:
        self._logger = logger_callable

    def _log(self, event: str, payload: dict) -> None:
        if self._logger is not None:
            try:
                self._logger(event, payload)
            except Exception:
                # strict mode (OSCILLINK_STRICT_LOGGING): a broken logger
                # is a deployment bug worth failing loudly on; default
                # keeps the reference's swallow-errors contract
                if _env_flag("OSCILLINK_STRICT_LOGGING"):
                    raise

    def set_receipt_secret(
        self, secret: bytes | str | None, kid: Optional[str] = None
    ) -> None:
        """``kid`` (optional) stamps the signature block with a key id so
        verifiers holding a rotation map {kid: secret} pick the right key
        (reference roadmap: multi-secret receipt signing)."""
        if secret is None:
            self._receipt_secret = None
            self._receipt_secret_kid = None
        else:
            self._receipt_secret = (
                secret.encode("utf-8") if isinstance(secret, str) else secret
            )
            self._receipt_secret_kid = kid

    def set_signature_mode(self, mode: str) -> None:
        m = mode.lower().strip()
        if m not in {"minimal", "extended"}:
            raise ValueError("mode must be 'minimal' or 'extended'")
        self._signature_mode = m

    def set_receipt_detail(self, mode: str) -> None:
        m = mode.lower().strip()
        if m not in {"full", "light"}:
            raise ValueError("mode must be 'full' or 'light'")
        self._receipt_detail = m

    def __repr__(self) -> str:  # pragma: no cover
        parts = [
            f"N={self.N}",
            f"D={self.D}",
            f"k={self._kneighbors}",
            f"lamG={self.lamG}",
            f"lamC={self.lamC}",
            f"lamQ={self.lamQ}",
        ]
        if self.lamP > 0 and self._chain_nodes is not None:
            parts.append(f"chain_len={len(self._chain_nodes)}")
            parts.append(f"lamP={self.lamP}")
        if self._Ustar_cache_dev is not None:
            parts.append("U*cached")
        return "OscillinkLattice(" + ", ".join(parts) + ")"


def json_line_logger(stream=None):
    """Logger factory emitting compact JSON Lines events to ``stream``."""
    import sys

    if stream is None:
        stream = sys.stderr

    def _log(ev: str, payload: dict):  # pragma: no cover
        try:
            obj = {"event": ev, **payload}
            stream.write(json.dumps(obj, separators=(",", ":")) + "\n")
        except Exception:
            pass

    return _log
