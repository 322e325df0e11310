"""Device-side receipt diagnostics: edge-parallel, never O(N^2).

Behavioral contracts from the reference (oscillink/core/receipts.py):
  * deltaH_trace (receipts.py:10-25): one operator application + full-sum.
  * per_node_components (receipts.py:28-60): the reference runs an O(N*k*D)
    Python double loop; here it is a single vectorized gather + reduction.
  * null_points (receipts.py:63-83): the reference materializes an O(N^2 D)
    pairwise-difference tensor; here residuals live only on the k-sparse
    edges.  Row mean/std are still taken over ALL N columns (zeros included)
    to reproduce the reference's z-scores exactly:
        mu_i    = sum_j R_ij / N
        sigma_i = sqrt(E[R^2] - mu^2) + 1e-12
    and the zero (non-edge) entries have z = -mu/sigma <= any edge z, so the
    per-row argmax over the dense row equals the max over the sparse edges.
  * chain edge stats (lattice.py:466-515) reuse the same sparse row moments.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.coherence import EnergyParams, stationary_matvec
from .graph import Graph
from .path import PathGraph

__all__ = [
    "deltaH_trace",
    "per_node_components",
    "coherence_drop",
    "null_points_sparse",
    "chain_edge_stats",
    "bundle_scores",
    "dynamics_core",
]


def deltaH_trace(
    g: Graph,
    pg: Optional[PathGraph],
    U: jax.Array,
    Ustar: jax.Array,
    lam: EnergyParams,
    B: jax.Array,
) -> jax.Array:
    """deltaH = tr((U - U*)^T M (U - U*)) via one operator application."""
    diff = (U - Ustar).astype(jnp.float32)
    term = stationary_matvec(g, pg, lam, B, diff)
    return jnp.sum(diff * term)


def _deg_normalized(g: Graph, X: jax.Array) -> jax.Array:
    return X / (g.sqrt_deg[:, None] + 1e-12)


# direct-path budget for the [N, K, D] gathered-neighbor temp; above this the
# edge distances are computed in row blocks (at 1M x 8 x 768 f32 the direct
# temp would be ~24 GB — past HBM; blocked it is ~192 MB per step)
_EDGE_TEMP_BUDGET_BYTES = 1 << 30
_EDGE_BLOCK_ROWS = 8192


def _edge_sq_dists(
    g: Graph, X: jax.Array, inv_row_scale: Optional[jax.Array] = None
) -> jax.Array:
    """[N, K] squared distances ||s_i X_i - s_j X_j||^2 along graph edges,
    with optional per-row scaling s = ``inv_row_scale`` (the receipts'
    1/sqrt_deg normalization).

    Row-blocked above a temp-size budget so full receipts stay in-HBM at
    500k-1M nodes (the reference's O(N^2 D) variant is receipts.py:63-83;
    this one is edge-sparse AND bounded-temp).  The row scaling is applied
    INSIDE each block so the scaled [N, D] matrix is never materialized —
    at 1M x 768 that saves two 3 GB temps per receipt."""
    n, d = X.shape
    k = g.idx.shape[1]
    if 4 * n * k * d <= _EDGE_TEMP_BUDGET_BYTES or n <= _EDGE_BLOCK_ROWS:
        Xn = X if inv_row_scale is None else X * inv_row_scale[:, None]
        diff = Xn[:, None, :] - jnp.take(Xn, g.idx, axis=0)
        return jnp.sum(diff * diff, axis=-1).astype(jnp.float32)

    B = _EDGE_BLOCK_ROWS
    n_steps = -(-n // B)

    def step(s, out):
        start = jnp.minimum(s * B, n - B)  # tail overlaps; rewrites are equal
        xb = jax.lax.dynamic_slice(X, (start, 0), (B, d))
        ib = jax.lax.dynamic_slice(g.idx, (start, 0), (B, k))
        xg = jnp.take(X, ib, axis=0)
        if inv_row_scale is not None:
            sb = jax.lax.dynamic_slice(inv_row_scale, (start,), (B,))
            xb = xb * sb[:, None]
            xg = xg * jnp.take(inv_row_scale, ib, axis=0)[:, :, None]
        diff = xb[:, None, :] - xg
        d2 = jnp.sum(diff * diff, axis=-1).astype(jnp.float32)
        return jax.lax.dynamic_update_slice(out, d2, (start, 0))

    # f32 accumulator regardless of X's dtype: the in-step arithmetic
    # promotes to f32 (row scaling), and dynamic_update_slice requires the
    # operand dtypes to match — a bf16 X would otherwise crash exactly and
    # only on the blocked (large-N) path
    out = jnp.zeros((n, k), dtype=jnp.float32)
    return jax.lax.fori_loop(0, n_steps, step, out)


def _inv_sqrt_deg(g: Graph) -> jax.Array:
    return 1.0 / (g.sqrt_deg + 1e-12)


def coherence_drop(
    g: Graph, Y: jax.Array, Ustar: jax.Array, lamC: jax.Array
) -> jax.Array:
    """Per-node coherence drop (reference receipts.py:44-55, lattice.py:803-822).

    coh_i = sum_j 0.5 lamC w_ij (||Yn_i - Yn_j||^2 - ||Un_i - Un_j||^2)
    with Xn = X / (sqrt_deg + 1e-12); normalization folded into the blocked
    edge pass (no [N, D] scaled temps at large N).
    """
    inv = _inv_sqrt_deg(g)
    dy2 = _edge_sq_dists(g, Y, inv)
    du2 = _edge_sq_dists(g, Ustar, inv)
    return jnp.sum(0.5 * lamC * g.w * (dy2 - du2), axis=1)


def per_node_components(
    g: Graph,
    Y: jax.Array,
    Ustar: jax.Array,
    lam: EnergyParams,
    B: jax.Array,
    psi: jax.Array,
):
    """(coh_drop, anchor_pen, query_term) per node (receipts.py:28-60)."""
    coh = coherence_drop(g, Y, Ustar, lam.lamC)
    anchor_pen = lam.lamG * jnp.sum((Ustar - Y) ** 2, axis=1)
    qp = Ustar - psi[None, :]
    query_term = lam.lamQ * B * jnp.sum(qp * qp, axis=1)
    return coh, anchor_pen, query_term


class SparseRowStats(NamedTuple):
    """Row moments of an edge-sparse residual matrix taken over N dense columns."""

    R: jax.Array  # [N, K] edge residuals
    mu: jax.Array  # [N]
    sigma: jax.Array  # [N]


def _row_stats_over_dense(R: jax.Array, n_cols: int) -> SparseRowStats:
    s1 = jnp.sum(R, axis=1)
    s2 = jnp.sum(R * R, axis=1)
    mu = s1 / n_cols
    var = jnp.maximum(s2 / n_cols - mu * mu, 0.0)
    sigma = jnp.sqrt(var) + 1e-12
    return SparseRowStats(R=R, mu=mu, sigma=sigma)


def structural_residuals(
    g: Graph, Ustar: jax.Array, lamC: jax.Array
) -> SparseRowStats:
    """R_ij = lamC * w_ij * ||Un_i - Un_j||^2 with dense-row moments."""
    d2 = _edge_sq_dists(g, Ustar, _inv_sqrt_deg(g))
    R = lamC * g.w * d2
    return _row_stats_over_dense(R, g.n_nodes)


def null_points_sparse(
    g: Graph, Ustar: jax.Array, lamC: jax.Array, z_th: float = 3.0
):
    """Anomalous-edge detection (receipts.py:63-83), edge-sparse.

    Returns (flag[N] bool, j[N] int32, z[N], r[N]): per row, the argmax-z edge
    with flag set when r > 0 and z > z_th.
    """
    st = structural_residuals(g, Ustar, lamC)
    # argmax over the dense row == edge with max residual (zeros have minimal z)
    slot = jnp.argmax(st.R, axis=1)
    rows = jnp.arange(g.n_nodes)
    r_best = st.R[rows, slot]
    # z is monotone in R per row (sigma > 0): derive the best z from the
    # best residual instead of materializing the full [N, K] z matrix
    z_best = (r_best - st.mu) / st.sigma
    j_best = g.idx[rows, slot]
    flag = (r_best > 0) & (z_best > z_th)
    return flag, j_best, z_best, r_best


def _edge_weight_lookup(g: Graph, i: jax.Array, j: jax.Array) -> jax.Array:
    """w_ij for query edges (i[e], j[e]) — 0 when absent from row i."""
    row_idx = g.idx[i]  # [E, K]
    row_w = g.w[i]  # [E, K]
    hit = row_idx == j[:, None]
    return jnp.sum(jnp.where(hit, row_w, 0.0), axis=1)


def chain_edge_stats(
    g: Graph,
    pg: PathGraph,
    Ustar: jax.Array,
    Y: jax.Array,
    lamC: jax.Array,
    ci: jax.Array,
    cj: jax.Array,
):
    """Per-chain-edge z-scores and residuals (reference lattice.py:466-515).

    ci/cj are the consecutive chain pairs [E].  Structural residual row
    moments come from the k-sparse graph; path residual row moments from the
    path edge list (both over N dense columns, matching the reference).
    Returns (z_struct, z_path, r_struct, r_path, gain_terms) each [E].
    """
    n = g.n_nodes
    Un = _deg_normalized(g, Ustar)
    st = structural_residuals(g, Ustar, lamC)

    # path residuals R_p = max(lamC, 1e-6) * A_path * d2 over path edges
    lamC_p = jnp.maximum(lamC, 1e-6)
    dsq_path = jnp.sum((Un[pg.src] - Un[pg.dst]) ** 2, axis=1)
    Rp_edges = lamC_p * pg.w * dsq_path  # [Ep]
    s1 = jnp.zeros(n, jnp.float32).at[pg.src].add(Rp_edges).at[pg.dst].add(
        jnp.where(pg.src == pg.dst, 0.0, Rp_edges)
    )
    s2 = jnp.zeros(n, jnp.float32).at[pg.src].add(Rp_edges**2).at[pg.dst].add(
        jnp.where(pg.src == pg.dst, 0.0, Rp_edges**2)
    )
    mu_p = s1 / n
    var_p = jnp.maximum(s2 / n - mu_p * mu_p, 0.0)
    sig_p = jnp.sqrt(var_p) + 1e-12

    # per queried chain edge (i, j)
    d2_c = jnp.sum((Un[ci] - Un[cj]) ** 2, axis=1)
    w_c = _edge_weight_lookup(g, ci, cj)
    r_struct = lamC * w_c * d2_c
    z_struct = (r_struct - st.mu[ci]) / st.sigma[ci]

    # path weight for the queried edge
    key_i = jnp.minimum(ci, cj)
    key_j = jnp.maximum(ci, cj)
    hit = (pg.src[None, :] == key_i[:, None]) & (pg.dst[None, :] == key_j[:, None])
    wp_c = jnp.sum(jnp.where(hit, pg.w[None, :], 0.0), axis=1)
    r_path = lamC_p * wp_c * d2_c
    z_path = (r_path - mu_p[ci]) / sig_p[ci]

    # chain coherence gain vs anchors (lattice.py:509-515)
    di = g.sqrt_deg + 1e-12
    Ynorm = Y / di[:, None]
    ydiff2 = jnp.sum((Ynorm[ci] - Ynorm[cj]) ** 2, axis=1)
    gain_terms = 0.5 * lamC * jnp.maximum(w_c, 0.0) * (ydiff2 - d2_c)

    return z_struct, z_path, r_struct, r_path, gain_terms


def bundle_scores(
    g: Graph,
    Y: jax.Array,
    Ustar: jax.Array,
    psi: jax.Array,
    lamC: jax.Array,
    alpha,
):
    """score = alpha * z(coherence_drop) + (1 - alpha) * cos(U*, psi)
    (reference lattice.py:530-568). Returns (score[N], align[N])."""
    u_norm = jnp.linalg.norm(Ustar, axis=1, keepdims=True) + 1e-12
    psi_n = psi / (jnp.linalg.norm(psi) + 1e-12)
    align = (Ustar / u_norm) @ psi_n
    coh = coherence_drop(g, Y, Ustar, lamC)
    mu = jnp.mean(coh)
    sigma = jnp.std(coh) + 1e-12
    z = (coh - mu) / sigma
    score = alpha * z + (1.0 - alpha) * align
    return score, align


def dynamics_core(
    g: Graph,
    pg: Optional[PathGraph],
    U_prev: jax.Array,
    U_next: jax.Array,
    lam: EnergyParams,
    B: jax.Array,
    top_k_flows: int = 16,
):
    """Single-step dynamics snapshot (reference lattice.py:824-903), on device.

    Returns (move2[N], dH_step, flow_total, top_flow_vals[T], top_flow_i[T],
    top_flow_j[T]) — BFS coherence radius stays host-side.
    Edge flows: f_ij = max(0, e_prev - e_next) with
    e = 0.5 lamC w ||Xn_i - Xn_j||^2; each undirected edge appears twice in the
    padded rows (both directions), mirroring the reference's np.argwhere walk.
    """
    dU = (U_next - U_prev).astype(jnp.float32)
    move2 = jnp.sum(dU * dU, axis=1)
    dH_step = deltaH_trace(g, pg, U_prev, U_next, lam, B)

    inv = _inv_sqrt_deg(g)
    e_prev = 0.5 * lam.lamC * g.w * _edge_sq_dists(g, U_prev, inv)
    e_next = 0.5 * lam.lamC * g.w * _edge_sq_dists(g, U_next, inv)
    flow = jnp.where(g.w > 0, jnp.maximum(0.0, e_prev - e_next), 0.0)
    flow_total = jnp.sum(flow)

    flat = flow.reshape(-1)
    t = min(top_k_flows, flat.shape[0])
    vals, pos = jax.lax.top_k(flat, t)
    fi = pos // g.k_max
    fj = g.idx.reshape(-1)[pos]
    return move2, dH_step, flow_total, vals, fi, fj


# -- deterministic (bit-reproducible) deltaH ---------------------------------
#
# The default `deltaH_trace` inherits XLA's reduction order, which can differ
# between compilations, backends, and mesh layouts at the float32 LSB.  The
# deterministic variant fixes EVERY accumulation order explicitly:
#
#   * all arithmetic in float64 (f64 ops are IEEE-exact per op; no FMA
#     contraction is applied to the emulated f64 path on TPU),
#   * the K neighbor contributions accumulate in slot order,
#   * the D-axis and N-axis sums are fixed pairwise binary trees.
#
# Given identical (U, U*, graph, params) float32 inputs the result is
# BIT-IDENTICAL across CPU/TPU, device counts, and runs; `deltaH_tree_np` is
# the executable NumPy specification and must produce the same bits
# (tests/test_deterministic_receipts.py).  This implements the fixed-order
# reduction design of SURVEY.md §7 for the receipt path; the remaining
# cross-implementation delta vs the reference's np.sum/BLAS pipeline is the
# solver's float32 state itself, bounded and documented in BASELINE.md.


def _tree_sum_last(x):
    """Fixed pairwise-tree sum over the last axis (shape-static unroll)."""
    n = x.shape[-1]
    while n > 1:
        if n % 2:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, 1)]
            x = jnp.pad(x, pad)
            n += 1
        x = x[..., 0::2] + x[..., 1::2]
        n //= 2
    return x[..., 0]


def deltaH_trace_deterministic(
    g: Graph,
    pg: Optional[PathGraph],
    U: jax.Array,
    Ustar: jax.Array,
    lam: EnergyParams,
    B: jax.Array,
) -> jax.Array:
    """deltaH = tr((U-U*)^T M (U-U*)) with fixed-order f64 accumulation."""
    if not jax.config.jax_enable_x64:
        # without x64, astype(float64) silently computes in f32 and the
        # bit-reproducibility contract is void — fail loudly; the lattice
        # wraps this call in `with jax.enable_x64(True)` (core/lattice.py)
        raise RuntimeError(
            "deltaH_trace_deterministic requires x64: call inside "
            "`with jax.experimental.enable_x64():` (jax_enable_x64)"
        )
    diff = U.astype(jnp.float64) - Ustar.astype(jnp.float64)
    wn = g.wn.astype(jnp.float64)
    acc = diff
    for a in range(g.k_max):
        acc = acc - wn[:, a][:, None] * jnp.take(diff, g.idx[:, a], axis=0)
    term = (
        lam.lamG.astype(jnp.float64) * diff
        + lam.lamC.astype(jnp.float64) * acc
        + lam.lamQ.astype(jnp.float64) * (B.astype(jnp.float64)[:, None] * diff)
    )
    if pg is not None and pg.n_edges > 0:
        # Chain prior with PINNED accumulation order: edges are sorted at
        # build time (ops/path.py build_path_graph), and each edge lands as
        # two single-index scatters in e-ascending, src-before-dst order.
        # Chains are tiny (E = len(chain)-1), so the unroll is cheap.
        pwn = pg.wn.astype(jnp.float64)
        pacc = jnp.zeros_like(diff)
        for e in range(pg.n_edges):
            pacc = pacc.at[pg.src[e]].add(pwn[e] * diff[pg.dst[e]])
            pacc = pacc.at[pg.dst[e]].add(pwn[e] * diff[pg.src[e]])
        term = term + lam.lamP.astype(jnp.float64) * (diff - pacc)
    per_node = _tree_sum_last(diff * term)  # [N]
    return _tree_sum_last(per_node)


def deltaH_tree_np(
    idx, wn, U, Ustar, lamG, lamC, lamQ, B,
    path_src=None, path_dst=None, path_wn=None, lamP=0.0,
):
    """NumPy twin of `deltaH_trace_deterministic` — the executable spec; must
    match the device result bit-for-bit (chain prior included when the sorted
    path edge list is passed)."""
    import numpy as np

    # lambdas live as float32 on device and are cast f32 -> f64 there; the
    # spec must round through float32 the same way or non-f32-exact values
    # (e.g. 0.3) diverge at the f64 LSB.
    lam64 = lambda v: np.float64(np.float32(v))  # noqa: E731
    diff = U.astype(np.float64) - Ustar.astype(np.float64)
    wn64 = wn.astype(np.float64)
    acc = diff.copy()
    for a in range(idx.shape[1]):
        acc = acc - wn64[:, a][:, None] * diff[idx[:, a]]
    term = (
        lam64(lamG) * diff
        + lam64(lamC) * acc
        + lam64(lamQ) * (B.astype(np.float64)[:, None] * diff)
    )
    if path_src is not None and len(path_src) > 0:
        pwn = np.asarray(path_wn, dtype=np.float64)
        pacc = np.zeros_like(diff)
        for e in range(len(path_src)):
            s, d = int(path_src[e]), int(path_dst[e])
            pacc[s] = pacc[s] + pwn[e] * diff[d]
            pacc[d] = pacc[d] + pwn[e] * diff[s]
        term = term + lam64(lamP) * (diff - pacc)

    def tree(x):
        n = x.shape[-1]
        while n > 1:
            if n % 2:
                x = np.concatenate(
                    [x, np.zeros(x.shape[:-1] + (1,), dtype=x.dtype)], axis=-1
                )
                n += 1
            x = x[..., 0::2] + x[..., 1::2]
            n //= 2
        return x[..., 0]

    return tree(tree(diff * term))
