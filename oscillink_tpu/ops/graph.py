"""Mutual-kNN graph construction as TPU-native XLA ops.

Behavioral contract (reference: oscillink/core/graph.py:8-93):
  * cosine similarity S = Yn @ Yn^T with row normalization Y/(||Y||+1e-12);
  * per-row top-k neighbors, ties broken by (similarity desc, index asc);
  * keep only strictly positive similarities;
  * mutual mask: an edge (i, j) survives iff j is in top-k(i) AND i is in
    top-k(j); surviving weight is max(w_ij, w_ji);
  * row-sum cap with geometric-mean scaling sqrt(scale_i * scale_j) preserving
    symmetry (graph.py:69-83);
  * normalized-Laplacian degrees sqrt(max(rowsum, 1e-12)) (graph.py:86-93).

TPU-first departures:
  * the adjacency is k-sparse from birth: padded [N, K] neighbor idx/weight
    arrays.  The dense N x N Laplacian of the reference is NEVER materialized;
    `lap_matvec` below is a gather-SpMV over the padded rows.
  * similarity + top-k is computed in row blocks (lax.map) so peak memory is
    O(block * N) instead of O(N^2); each block is one large MXU matmul.
  * `jax.lax.top_k` is stable (lowest index wins ties), which reproduces the
    reference's deterministic mode (graph.py:44-52) by construction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "Graph",
    "build_graph",
    "graph_from_topk",
    "lap_matvec",
    "normalize_rows",
    "mmr_select",
    "mmr_select_np",
    "resolve_similarity",
    "SIMILARITY_RECALL",
    "FAST_SIMILARITY_N",
    "CLUSTER_SIMILARITY_N",
]

# Row-block size for the blocked similarity top-k. 1024 rows x N cols of f32
# keeps the per-block buffer modest while the matmul stays MXU-shaped.
DEFAULT_BLOCK_ROWS = 1024
# Below this N the dense [N, N] similarity fits comfortably; skip blocking.
DENSE_TOPK_LIMIT = 4096
# similarity="auto" switches to the approx top-k above this N (override with
# OSCILLINK_FAST_SIM_N).  At 98k x 768 the exact scan is 838 ms vs 388 ms
# fast (recall 0.99); below ~64k the exact scan is cheap enough to keep the
# recall-1.0 contract by default.
FAST_SIMILARITY_N = 65536

# per-row top-k recall contract of each similarity mode (surfaced in
# receipt meta so approximate builds are auditable)
# "cluster" carries the IVF acceptance bar (ops/ivf.py min_recall; the
# receipt's similarity_info holds the per-build measured estimate)
SIMILARITY_RECALL = {"exact": 1.0, "fast": 0.99, "fastest": 0.95, "cluster": 0.9}

# similarity="auto" on a single device routes to the IVF cluster build above
# this N (override with OSCILLINK_CLUSTER_SIM_N; 0 disables).  Measured at
# 1M x 768: balanced IVF 3.7 s vs 9.9 s fast scan (2.7x) with the quality
# gate accepting both study corpora (benchmarks/ivf_balanced_1m.json); a
# sampled clusterability pre-gate means isotropic corpora skip straight to
# the fast scan without paying a failed IVF attempt (ops/ivf.py).
CLUSTER_SIMILARITY_N = 500_000


def resolve_similarity(n: int, mode: str, *, allow_cluster: bool = False) -> str:
    """Map ``"auto"`` to a concrete mode for an N-row build: ``"cluster"``
    (gated IVF) above CLUSTER_SIMILARITY_N when the caller supports it,
    else ``"fast"`` (recall 0.99) above FAST_SIMILARITY_N /
    OSCILLINK_FAST_SIM_N, else ``"exact"``.  Concrete modes pass through
    unchanged.  ``allow_cluster`` is opted into by the single-device
    lattice; the sharded tiers keep auto->fast (IVF is single-device)."""
    if mode != "auto":
        return mode
    import os

    if allow_cluster:
        try:
            cthr = int(os.getenv("OSCILLINK_CLUSTER_SIM_N", str(CLUSTER_SIMILARITY_N)))
        except ValueError:
            cthr = CLUSTER_SIMILARITY_N
        if cthr > 0 and n >= cthr:
            return "cluster"
    try:
        thr = int(os.getenv("OSCILLINK_FAST_SIM_N", str(FAST_SIMILARITY_N)))
    except ValueError:
        thr = FAST_SIMILARITY_N
    return "fast" if n > thr else "exact"


class Graph(NamedTuple):
    """Padded k-sparse symmetric adjacency + normalized-Laplacian factors.

    Fields (N nodes, K = padded neighbor count):
      idx:      [N, K] int32 — neighbor ids; arbitrary where ``w == 0``.
      w:        [N, K] float32 — capped adjacency weights; 0 on padding.
      wn:       [N, K] float32 — degree-normalized weights
                w_ij / (sqrt_deg_i * sqrt_deg_j); 0 on padding.
      sqrt_deg: [N] float32 — sqrt(max(row_sum(w), 1e-12)).
    """

    idx: jax.Array
    w: jax.Array
    wn: jax.Array
    sqrt_deg: jax.Array

    @property
    def n_nodes(self) -> int:
        return self.idx.shape[0]

    @property
    def k_max(self) -> int:
        return self.idx.shape[1]


def normalize_rows(Y: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Row-normalize to unit length with the reference's epsilon guard."""
    nrm = jnp.linalg.norm(Y, axis=1, keepdims=True)
    return Y / (nrm + eps)


def _topk_dense(Yn: jax.Array, k: int, jitter: Optional[jax.Array]):
    """Dense [N, N] similarity + top-k. Used for moderate N."""
    n = Yn.shape[0]
    # HIGHEST precision: similarity values feed neighbor selection, adjacency
    # weights, and state signatures — bf16 MXU passes would drift vs the
    # NumPy oracle by ~2e-3, far above the receipt tolerance.
    S = jnp.dot(
        Yn, Yn.T, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST
    )
    if jitter is not None:
        S = S + jitter
    diag = jnp.arange(n)
    S = S.at[diag, diag].set(-jnp.inf)
    vals, idx = lax.top_k(S, k)
    return vals, idx.astype(jnp.int32)


def _topk_blocked(
    Yq: jax.Array,
    Yn: jax.Array,
    k: int,
    block_rows: int,
    row_offset: int | jax.Array = 0,
):
    """Blocked similarity top-k of query rows ``Yq`` against all of ``Yn``.

    ``row_offset`` is the global id of Yq's first row (for self-exclusion) —
    0 for the single-device build, the shard offset under shard_map.
    O(block * N) memory, full-MXU matmuls."""
    n_q = Yq.shape[0]
    n = Yn.shape[0]
    nblocks = -(-n_q // block_rows)
    npad = nblocks * block_rows
    Ypad = jnp.pad(Yq, ((0, npad - n_q), (0, 0)))
    col_ids = jnp.arange(n, dtype=jnp.int32)
    row_offset = jnp.asarray(row_offset, dtype=jnp.int32)

    def one_block(b):
        rows = lax.dynamic_slice_in_dim(Ypad, b * block_rows, block_rows)
        S = jnp.dot(
            rows, Yn.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )  # [B, N]
        gidx = row_offset + b * block_rows + jnp.arange(block_rows, dtype=jnp.int32)
        S = jnp.where(col_ids[None, :] == gidx[:, None], -jnp.inf, S)
        # measured dead end (round 2): a two-stage EXACT top-k (per-2048-col
        # tile top_k -> top_k over the candidate pool; provably identical
        # incl. tie order) slope-timed 4701 ms/build vs 831 ms for the plain
        # wide top_k at 98k x 768 — batched [B, nt, T] top_k lowers ~6x
        # worse than one [B, N] top_k on v5e.  Like the iterative-argmax
        # variant (round 1), splitting the reduction loses; approx_max_k +
        # rescore ("fast"/"fastest") remains the only profitable shortcut.
        vals, idx = lax.top_k(S, k)
        return vals, idx.astype(jnp.int32)

    vals, idx = lax.map(one_block, jnp.arange(nblocks))
    return vals.reshape(npad, k)[:n_q], idx.reshape(npad, k)[:n_q]


def _topk_blocked_fast(
    Yq: jax.Array,
    Yn: jax.Array,
    k: int,
    block_rows: int,
    overscan: int = 4,
    recall_target: float = 0.99,
    row_offset: int | jax.Array = 0,
):
    """Two-pass blocked top-k: bf16 MXU scan + approx_max_k + exact rescore.

    Measured at N=98k, D=768, k=8 on TPU v5e: the exact build (f32-HIGHEST
    matmul + lax.top_k) costs 838 ms and is TOP-K bound, not matmul bound.
    This path uses the TPU-native `lax.approx_max_k` over a bf16 similarity
    scan to pick ``overscan * k`` candidates, then rescores them with exact
    f32 dots:

        overscan=4, recall 0.99 -> 388 ms, 99.6% identical neighbor rows
        overscan=4, recall 0.95 -> 171 ms, 96.5% identical rows

    Selected weights are exact f32 similarities in every case; disagreements
    are confined to near-tie tail neighbors (further softened by the mutual
    mask downstream).
    """
    n_q = Yq.shape[0]
    n = Yn.shape[0]
    kc = min(overscan * k, n - 1)
    nblocks = -(-n_q // block_rows)
    npad = nblocks * block_rows
    Ypad = jnp.pad(Yq, ((0, npad - n_q), (0, 0)))
    col_ids = jnp.arange(n, dtype=jnp.int32)
    Yn_bf16 = Yn.astype(jnp.bfloat16)
    Ypad_bf16 = Ypad.astype(jnp.bfloat16)
    row_offset = jnp.asarray(row_offset, dtype=jnp.int32)

    def one_block(b):
        rows = lax.dynamic_slice_in_dim(Ypad_bf16, b * block_rows, block_rows)
        S = jnp.dot(rows, Yn_bf16.T, preferred_element_type=jnp.float32)  # [B, N]
        gidx = row_offset + b * block_rows + jnp.arange(block_rows, dtype=jnp.int32)
        S = jnp.where(col_ids[None, :] == gidx[:, None], -jnp.inf, S)
        _, cand = lax.approx_max_k(S, kc, recall_target=recall_target)
        cand = cand.astype(jnp.int32)
        # exact rescore of the candidates in f32
        rows_f32 = lax.dynamic_slice_in_dim(Ypad, b * block_rows, block_rows)
        cand_rows = jnp.take(Yn, cand, axis=0)  # [B, kc, D]
        exact = jnp.einsum(
            "bd,bkd->bk", rows_f32, cand_rows, precision=lax.Precision.HIGHEST
        )
        exact = jnp.where(cand == gidx[:, None], -jnp.inf, exact)
        vals, sel = lax.top_k(exact, k)
        idx = jnp.take_along_axis(cand, sel, axis=1)
        return vals, idx.astype(jnp.int32)

    vals, idx = lax.map(one_block, jnp.arange(nblocks))
    return vals.reshape(npad, k)[:n_q], idx.reshape(npad, k)[:n_q]


def build_graph(
    Y: jax.Array,
    k: int,
    *,
    row_cap: float = 1.0,
    jitter: Optional[jax.Array] = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    dense_limit: int = DENSE_TOPK_LIMIT,
    similarity: str = "exact",
) -> Graph:
    """Build the mutual-kNN graph. ``k`` must be pre-clamped to [1, N-1].

    ``jitter`` is an optional [N, N] tie-break perturbation (reference
    graph.py:54-58 seed mode); only supported on the dense path.
    ``similarity="fast"`` (recall 0.99, ~2.2x) / ``"fastest"`` (recall 0.95,
    ~4.9x) use the bf16 scan + approx_max_k + f32-rescore two-pass top-k on
    the blocked path; exact weights either way (see _topk_blocked_fast).
    ``similarity="auto"`` resolves by N (see `resolve_similarity`).
    """
    n = Y.shape[0]
    similarity = resolve_similarity(n, similarity)
    if similarity == "cluster":
        raise ValueError(
            "similarity='cluster' (IVF) is served by ops.ivf.build_graph_ivf "
            "(or OscillinkLattice, which routes it); build_graph has no "
            "cluster path"
        )
    if similarity not in ("exact", "fast", "fastest"):
        # a typo would otherwise silently run the exact scan — at 1M that
        # is a 9.9 s full pass standing in for the requested approximation
        raise ValueError(f"unknown similarity mode {similarity!r}")
    Yn = normalize_rows(Y.astype(jnp.float32))
    if jitter is not None or n <= dense_limit:
        vals, idx = _topk_dense(Yn, k, jitter)
    elif similarity == "fast":
        vals, idx = _topk_blocked_fast(Yn, Yn, k, block_rows, recall_target=0.99)
    elif similarity == "fastest":
        vals, idx = _topk_blocked_fast(Yn, Yn, k, block_rows, recall_target=0.95)
    else:
        vals, idx = _topk_blocked(Yn, Yn, k, block_rows)
    return graph_from_topk(vals, idx, row_cap=row_cap)


def graph_from_topk(
    vals: jax.Array, idx: jax.Array, *, row_cap: float = 1.0
) -> Graph:
    """Mutual mask + row cap + Laplacian factors from full [N, K] top-k
    arrays.  O(N K^2) — cheap relative to the similarity scan, and shared by
    the single-device and shard_map builds."""
    n = idx.shape[0]
    # --- mutual mask + symmetrized weights (graph.py:64-66) ---
    w_ij = jnp.maximum(vals, 0.0)  # clip(min=0), padding rows of top_k
    self_ids = jnp.arange(n, dtype=jnp.int32)[:, None, None]
    nbr_of_nbr = idx[idx]  # [N, K, K]: top-k lists of my top-k neighbors
    back_edge = nbr_of_nbr == self_ids  # does neighbor j list me?
    mutual = jnp.any(back_edge, axis=-1)  # [N, K]
    # w_ji: the weight j assigned to me (differs from w_ij only under jitter)
    vals_nbr = jnp.maximum(vals[idx], 0.0)  # [N, K, K]
    w_ji = jnp.sum(jnp.where(back_edge, vals_nbr, 0.0), axis=-1)
    keep = (w_ij > 0) & mutual & (w_ji > 0)
    w = jnp.where(keep, jnp.maximum(w_ij, w_ji), 0.0)

    # --- row-sum cap with geometric-mean scaling (graph.py:69-83) ---
    sums = jnp.sum(w, axis=1) + 1e-12
    scale = jnp.minimum(1.0, row_cap / sums).astype(jnp.float32)
    gs = jnp.sqrt(scale[:, None] * scale[idx])
    w = w * gs  # exactly symmetric: both row copies compute identical floats

    # --- normalized-Laplacian degrees (graph.py:86-93) ---
    deg = jnp.sum(w, axis=1)
    sqrt_deg = jnp.sqrt(jnp.maximum(deg, 1e-12))
    inv_sd = 1.0 / sqrt_deg
    wn = w * inv_sd[:, None] * inv_sd[idx]
    wn = jnp.where(w > 0, wn, 0.0)

    return Graph(idx=idx, w=w, wn=wn, sqrt_deg=sqrt_deg)


# Unrolled-gather temp budget: K live [N, D_c] gather temps above this spill
# the large-N solves (observed: 8 x [500k, 768] f32 = 11.4 GB killed the
# full-width settle at N=500k).
_UNROLL_TEMP_BYTES = 8_000_000_000
# Above this row count the row-blocked regime engages regardless of width:
# the column-chunked 500k-1M solves call this matvec with narrow X blocks
# whose unrolled temps (8 x [1M, 192] = 6.1 GB at col_chunks=4) still blow
# the chunk memory budget, and at these N the row-fetch engine is
# latency-bound so blocking the rows costs nothing (155-157 ms/apply across
# the whole rb sweep at 1M).
_KLOOP_MIN_ROWS = 325_000
# Row-blocked regime: bound the K in-flight gather temps to ~384 MB
# (K * RB * D * 4).  Solves at the 1M single-chip HBM margin need the temps
# small; the block-size sweep at 1M x 768 x k8 measured 155-157 ms/apply for
# rb in {15625, 31250, 62500} (vs 176 ms pair-sequenced), so within the
# fits-in-HBM range the choice is flat and the smallest footprint wins.
_KLOOP_TEMP_BYTES = 384_000_000


def _kloop_block_rows(n: int, d: int, k: int) -> int:
    import os

    raw = os.getenv("OSCILLINK_MATVEC_RB", "").strip()
    if raw:
        try:
            # clamp to N LAST so a forced rb can never exceed the dim
            return min(n, max(8, int(raw)))
        except ValueError:
            pass
    rb = _KLOOP_TEMP_BYTES // (k * d * 4)
    return min(n, max(1024, (rb // 8) * 8))


def lap_matvec(g: Graph, X: jax.Array) -> jax.Array:
    """Normalized-Laplacian matvec: (L_sym X)[i] = X[i] - sum_a wn[i,a] X[idx[i,a]].

    Gather-SpMV over the padded neighbor rows — the TPU replacement for the
    reference's dense ``L_sym @ X`` (oscillink/core/lattice.py:177).
    """
    # K-step accumulation.  Two regimes, decided statically from shapes:
    #
    #   * unrolled (small/medium N): XLA overlaps the K independent gathers
    #     — measured 12.7 ms/apply at N=100k, D=768, k=8 vs 20.9 ms fully
    #     sequenced — at the cost of K live [N, D] temps;
    #   * row-blocked k-loop (large N): a fori_loop over row blocks, the K
    #     gathers unrolled (and overlapping) WITHIN each block, so the temp
    #     footprint is K [RB, D] blocks (~768 MB) instead of K [N, D].
    #     Measured at 1M x 768 x k8 on v5e: 141-156 ms/apply vs 176 ms for
    #     the previous pair-sequenced full-width form (and 86 -> 70 ms at
    #     500k) — the row-fetch engine is latency-bound, so slicing the rows
    #     costs nothing while freeing ~5 GB of HBM at 1M
    #     (benchmarks/probe_lowmem.py).
    #
    # Accumulation order matches the reference a=0..K-1 subtracts in both.
    n, d = X.shape
    k_max = g.k_max
    temp_bytes = k_max * n * d * 4
    if n <= _KLOOP_MIN_ROWS and temp_bytes <= _UNROLL_TEMP_BYTES:
        acc = X
        for a in range(k_max):
            nbr = jnp.take(X, g.idx[:, a], axis=0)
            acc = acc - g.wn[:, a][:, None] * nbr
        return acc

    rb = _kloop_block_rows(n, d, k_max)
    nb = -(-n // rb)
    idx, wn = g.idx, g.wn

    def body(b, out):
        # When the final block overhangs N, every dynamic_slice /
        # dynamic_update_slice below clamps the start to N - rb IDENTICALLY,
        # so the overhang rows are simply recomputed with the same values —
        # correct because each block reads only X (the input), never `out`.
        r0 = b * rb
        acc = lax.dynamic_slice(X, (r0, 0), (rb, d))
        for a in range(k_max):
            i_a = lax.dynamic_slice(idx, (r0, a), (rb, 1))[:, 0]
            w_a = lax.dynamic_slice(wn, (r0, a), (rb, 1))[:, 0]
            acc = acc - w_a[:, None] * jnp.take(X, i_a, axis=0)
        return lax.dynamic_update_slice(out, acc, (r0, 0))

    return lax.fori_loop(0, nb, body, jnp.zeros_like(X))


def mmr_select(
    Yn: jax.Array, scores: jax.Array, k: int, lambda_div: float = 0.5
) -> jax.Array:
    """Greedy maximal-marginal-relevance selection on device.

    Parity with the reference's O(N*k) Python loop (graph.py:114-133):
      val_i = (1 - lambda) * score_i - lambda * max_{j in chosen} cos(i, j),
    first pick uses pure score (div = 0).  Instead of an N x N similarity
    matrix we maintain a running max-similarity-to-chosen vector and compute
    one [N] similarity column per selection — O(k * N * D) total.

    Returns [k] int32 selected indices in selection order.
    """
    n = Yn.shape[0]
    k = min(k, n)

    def step(carry, t):
        chosen_mask, simmax = carry
        div = jnp.where(t == 0, 0.0, simmax)
        val = (1.0 - lambda_div) * scores - lambda_div * div
        val = jnp.where(chosen_mask, -jnp.inf, val)
        pick = jnp.argmax(val).astype(jnp.int32)
        chosen_mask = chosen_mask.at[pick].set(True)
        sim_to_pick = jnp.dot(Yn, Yn[pick], precision=lax.Precision.HIGHEST)
        simmax = jnp.maximum(simmax, sim_to_pick)
        return (chosen_mask, simmax), pick

    init = (jnp.zeros(n, dtype=bool), jnp.full(n, -jnp.inf, dtype=jnp.float32))
    _, picks = lax.scan(step, init, jnp.arange(k))
    return picks


def mmr_select_np(
    Yn: np.ndarray, scores: np.ndarray, k: int, lambda_div: float = 0.5
) -> list[int]:
    """Host-NumPy twin of `mmr_select` — same rule, same tie-break
    (argmax = lowest index on ties).  For tiny host-side candidate pools
    (native engine bundle, streaming bundle) where a device dispatch per
    pick would dominate.  Returns the selected indices in pick order."""
    n = Yn.shape[0]
    k = min(k, n)
    chosen: list[int] = []
    mask = np.zeros(n, dtype=bool)
    simmax = np.full(n, -np.inf, dtype=np.float32)
    for t in range(k):
        div = np.zeros(n, dtype=np.float32) if t == 0 else simmax
        val = np.where(mask, -np.inf, (1.0 - lambda_div) * scores - lambda_div * div)
        pick = int(np.argmax(val))
        chosen.append(pick)
        mask[pick] = True
        simmax = np.maximum(simmax, Yn @ Yn[pick])
    return chosen
