"""IVF (inverted-file) clustered mutual-kNN build: sub-quadratic candidates.

The full similarity scan is MXU-FLOP-bound: at 1M x 768 the N^2 bf16 scan
is 1.5 PFLOP ≈ 7.8 s on one v5e — measured 9.9 s warm at recall 0.99
(benchmarks/scale_tpu.json build_1M_device_round3), i.e. the scan kernel is
at 80-90% of speed-of-light and further build speedups require scanning
FEWER pairs, not faster kernels.  This module is that algorithm, kept
TPU-native:

  1. k-means over the unit-normalized rows (a few matmul-dominated
     Lloyd iterations; assignments via an [N, C] bf16 scan),
  2. bucketize rows by cluster into a padded [C, P] table
     (P = bucket_factor * N/C, static; overflow COUNTED, see below),
  3. per-cluster scan: each cluster's rows score against the buckets of
     its m_probe nearest clusters ([P, m*P] bf16 matmul + approx_max_k),
  4. exact f32 rescore of the overscan*k candidates (selected weights are
     exact similarities, same contract as the "fast" scan), global top-k,
  5. `graph_from_topk` (mutual mask, row cap, Laplacian factors).

FLOPs: N * (m_probe * P) * D * 2 ≈ 25 TFLOP at 1M/C=1024/m=8 — ~60x less
than the full scan.

Failure containment (the coverage-gate pattern used throughout this repo):
capacity-constrained spillover assignment (`balance_rounds`) hard-bounds
bucket occupancy so overflow is normally ZERO; rows that still overflow
get exact patched neighbor LISTS (`patch_cap` bounds the scan), but a
patched row is absent from every bucket, so the mutual test would isolate
it — `build_graph_ivf` therefore falls back to the dense fast scan
whenever ANY row overflows, or when the sampled quality gate fails (id
recall AND per-slot sim-gap — see `_sample_quality`).  The `info` dict
carries the realized mode and quality estimates for receipts.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .graph import (
    Graph,
    build_graph,
    graph_from_topk,
    normalize_rows,
    resolve_similarity,
)

__all__ = ["build_graph_ivf", "ivf_topk"]

# the accepted path's epilogue as one compiled program (eager dispatch of
# its ~15 ops costs seconds of RPC latency on tunneled runtimes)
_jit_graph_from_topk = jax.jit(
    lambda vals, idx, row_cap: graph_from_topk(vals, idx, row_cap=row_cap)
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lloyd_update(A: jax.Array, Ys: jax.Array, cent: jax.Array, C: int, d: int):
    """One Lloyd step given the [M, C] similarity matrix: argmax-assign,
    mean, keep empty clusters' previous centroids, renormalize.  Shared by
    the full build (bf16 similarity) and the clusterability probe (f32)."""
    assign = jnp.argmax(A, axis=1)
    sums = jnp.zeros((C, d), jnp.float32).at[assign].add(Ys)
    cnts = jnp.zeros((C,), jnp.float32).at[assign].add(1.0)
    new = sums / (cnts[:, None] + 1e-6)
    new = jnp.where(cnts[:, None] > 0, new, cent)
    return normalize_rows(new)


def _rank_in_cluster(cur: jax.Array, sim: jax.Array, C: int, n: int):
    """Rank rows within their assigned cluster by DESCENDING centroid
    similarity: returns (order, a_sorted, pos) where ``order`` permutes rows
    into cluster-grouped blocks, ``a_sorted = cur[order]``, and ``pos`` is
    the 0-based rank within the cluster.  Two stable argsorts implement the
    (cluster asc, sim desc) lexsort without wide composite keys; ranking by
    centrality (not arrival order) means a capacity cap always keeps the
    most central members."""
    o1 = jnp.argsort(-sim)  # stable: desc-sim order
    o2 = jnp.argsort(cur[o1])  # stable: groups clusters, preserves sim order
    order = o1[o2]
    a_sorted = cur[order]
    start = jnp.searchsorted(a_sorted, jnp.arange(C, dtype=a_sorted.dtype), side="left")
    pos = jnp.arange(n, dtype=jnp.int32) - start[a_sorted].astype(jnp.int32)
    return order, a_sorted, pos


@partial(
    jax.jit,
    static_argnames=("k", "n_clusters", "bucket_cap", "m_probe", "kmeans_iters",
                     "overscan", "patch_cap", "balance_rounds", "balance_cands"),
)
def ivf_topk(
    Y: jax.Array,
    k: int,
    *,
    n_clusters: int,
    bucket_cap: int,
    m_probe: int,
    kmeans_iters: int = 6,
    overscan: int = 4,
    patch_cap: int = 2048,
    balance_rounds: int = 3,
    balance_cands: int = 4,
):
    """Per-row approximate top-k via clustered probing.

    Returns (vals [N, k] exact-f32 sims, idx [N, k] int32, overflow scalar,
    filled [N] bool — False for rows that never entered a bucket).

    Up to ``patch_cap`` bucket-overflow rows are PATCHED with an exact
    dense scan (a [cap, N] matmul — trivial FLOPs for hundreds of rows), so
    k-means imbalance does not leave rows without neighbors; only overflow
    beyond the cap requires the caller to fall back.

    ``balance_rounds`` > 0 enables capacity-constrained spillover
    assignment: per row the ``balance_cands`` nearest centroids are kept,
    and rows past a cluster's capacity (ranked by centroid similarity, so
    the most central stay) advance to their next-nearest candidate for the
    following round.  This HARD-bounds bucket occupancy regardless of
    k-means merge imbalance — the mechanism the measured-negative
    penalty-based balancing and split-reseeding could not provide (a merged
    cell's rows keep argmaxing to the merged centroid; here they are forced
    to the 2nd..Rth candidate).  Cost: 2 stable argsorts over N per round.
    """
    n, d = Y.shape
    # clamp the probe fanout to the cluster count (lax.top_k(CC, m) traces
    # with m > C otherwise) and guarantee the candidate pool covers k
    C, P = n_clusters, bucket_cap
    m = min(m_probe, n_clusters)
    if m * P < k:
        raise ValueError(
            f"m_probe*bucket_cap = {m * P} must be >= k = {k} "
            "(candidate pool smaller than the requested neighbor count)"
        )
    Yn = normalize_rows(Y.astype(jnp.float32))
    Yb = Yn.astype(jnp.bfloat16)

    # ---- k-means (Lloyd) on the unit sphere --------------------------------
    stride = max(n // C, 1)
    cent = Yn[:: stride][:C]
    cent = normalize_rows(cent)

    def lloyd(_, cent):
        A = jnp.dot(Yb, cent.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)  # [N, C]
        return _lloyd_update(A, Yn, cent, C, d)

    cent = lax.fori_loop(0, kmeans_iters, lloyd, cent)
    A = jnp.dot(Yb, cent.astype(jnp.bfloat16).T, preferred_element_type=jnp.float32)
    if balance_rounds > 0 and C >= 2:
        # capacity-constrained spillover: rows past a full cluster's cap
        # (least-central first) advance to their next-nearest candidate
        # (cap candidates at C — top_k cannot exceed the axis size)
        R = max(2, min(balance_cands, C))
        cvals, cidx = lax.top_k(A, R)  # [N, R]

        def bal(_, ptr):
            cur = jnp.take_along_axis(cidx, ptr[:, None], axis=1)[:, 0]
            sim = jnp.take_along_axis(cvals, ptr[:, None], axis=1)[:, 0]
            order_r, _, pos_r = _rank_in_cluster(cur, sim, C, n)
            over = jnp.zeros((n,), bool).at[order_r].set(pos_r >= P)
            return jnp.where(over & (ptr < R - 1), ptr + 1, ptr)

        ptr = lax.fori_loop(0, balance_rounds, bal, jnp.zeros((n,), jnp.int32))
        assign = jnp.take_along_axis(cidx, ptr[:, None], axis=1)[:, 0].astype(jnp.int32)
        a_sim = jnp.take_along_axis(cvals, ptr[:, None], axis=1)[:, 0]
    else:
        assign = jnp.argmax(A, axis=1).astype(jnp.int32)  # [N]
        a_sim = jnp.max(A, axis=1)

    # ---- bucketize: padded [C, P] membership table -------------------------
    # centrality-ranked (not arrival-ranked): a capped bucket keeps its most
    # central members, consistent with the balancing rounds' ranking
    order, a_sorted, pos = _rank_in_cluster(assign, a_sim, C, n)
    in_cap = pos < P
    overflow = jnp.sum(~in_cap)
    bucket = jnp.full((C, P), -1, jnp.int32)
    # overflow rows write to an out-of-range row id and are dropped — they
    # must NOT clobber slot P-1 of their cluster
    row_t = jnp.where(in_cap, a_sorted, C)
    bucket = bucket.at[row_t, jnp.minimum(pos, P - 1)].set(
        order.astype(jnp.int32), mode="drop"
    )
    filled = jnp.zeros((n,), bool).at[order].set(in_cap)

    # ---- probe sets: each cluster scans its m nearest clusters -------------
    CC = jnp.dot(cent, cent.T, preferred_element_type=jnp.float32)
    _, probe = lax.top_k(CC, m)  # [C, m], self is its own argmax

    # ---- per-cluster scan ---------------------------------------------------
    # Directly in f32-HIGHEST: IVF's scan is ~60x smaller than the dense
    # pass, so exact-precision matmul is affordable (~3x bf16) and
    # approx_max_k then returns EXACT similarities — no per-candidate
    # rescore gather (measured: the [P, oc, D] rescore gather traffic
    # dominated the bf16 variant), and near-tie ranking is exact.
    Yn_pad = jnp.concatenate([Yn, jnp.zeros((1, d), jnp.float32)], axis=0)
    oc = min(overscan * k, m * P)

    def scan_cluster(c):
        q_ids = bucket[c]  # [P]
        cand_ids = bucket[probe[c]].reshape(-1)  # [m*P]
        q = Yn_pad[q_ids]  # [P, D] (id -1 wraps to the zero pad row)
        cand = Yn_pad[cand_ids]  # [mP, D]
        S = jnp.dot(
            q, cand.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )  # [P, mP] exact f32
        invalid = (cand_ids[None, :] < 0) | (cand_ids[None, :] == q_ids[:, None])
        S = jnp.where(invalid, -jnp.inf, S)
        sv, slots = lax.approx_max_k(S, oc)  # [P, oc] exact sims + slots
        v, j = lax.top_k(sv, k)  # [P, k]
        sel = cand_ids[jnp.take_along_axis(slots, j, axis=1)]
        return q_ids, v, sel

    q_ids, vals_c, idx_c = lax.map(scan_cluster, jnp.arange(C))
    # scatter per-cluster results into global row order
    flat_q = q_ids.reshape(-1)
    ok = flat_q >= 0
    safe_q = jnp.where(ok, flat_q, n)  # drop padding via mode="drop"
    vals = jnp.zeros((n + 1, k), jnp.float32).at[safe_q].set(
        vals_c.reshape(-1, k), mode="drop"
    )[:n]
    idx = jnp.zeros((n + 1, k), jnp.int32).at[safe_q].set(
        jnp.maximum(idx_c.reshape(-1, k), 0), mode="drop"
    )[:n]
    vals = jnp.where(jnp.isfinite(vals), vals, 0.0)

    # ---- exact patch-scan for bucket-overflow rows --------------------------
    # lax.top_k on the unfilled mask is index-stable: the first `patch_cap`
    # unfilled row ids, padding with filled rows marked invalid
    pc = min(patch_cap, n)
    miss_flag, patch_ids = lax.top_k((~filled).astype(jnp.int32), pc)
    pvalid = miss_flag == 1
    chunk = 512
    pc_pad = _round_up(pc, chunk)
    patch_pad = jnp.pad(patch_ids, (0, pc_pad - pc))

    def patch_chunk(c):
        rows = lax.dynamic_slice(patch_pad, (c * chunk,), (chunk,))
        S = jnp.dot(
            Yn[rows], Yn.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        S = jnp.where(jnp.arange(n)[None, :] == rows[:, None], -jnp.inf, S)
        sv, cand = lax.approx_max_k(S, oc)
        v, j = lax.top_k(sv, k)
        return v, jnp.take_along_axis(cand, j, axis=1).astype(jnp.int32)

    pv, pi = lax.map(patch_chunk, jnp.arange(pc_pad // chunk))
    pv = pv.reshape(-1, k)[:pc]
    pi = pi.reshape(-1, k)[:pc]
    tgt = jnp.where(pvalid, patch_ids, n)
    vals = jnp.concatenate([vals, jnp.zeros((1, k), vals.dtype)]).at[tgt].set(
        pv, mode="drop"
    )[:n]
    idx = jnp.concatenate([idx, jnp.zeros((1, k), idx.dtype)]).at[tgt].set(
        pi, mode="drop"
    )[:n]
    vals = jnp.where(jnp.isfinite(vals), vals, 0.0)
    filled = filled | (jnp.zeros((n + 1,), bool).at[tgt].set(True, mode="drop")[:n])
    return vals, idx, overflow, filled


def _kmeans_maxsim(Ys: jax.Array, C: int, iters: int, d: int) -> jax.Array:
    """Mean max centroid similarity after a small f32 sub-k-means."""
    m = Ys.shape[0]
    cent = normalize_rows(Ys[:: max(m // C, 1)][:C])

    def lloyd(_, cent):
        A = jnp.dot(Ys, cent.T, preferred_element_type=jnp.float32)
        return _lloyd_update(A, Ys, cent, C, d)

    cent = lax.fori_loop(0, iters, lloyd, cent)
    A = jnp.dot(Ys, cent.T, preferred_element_type=jnp.float32)
    return jnp.mean(jnp.max(A, axis=1))


@partial(jax.jit, static_argnames=("n_clusters", "iters", "sample"))
def _clusterability(Y: jax.Array, n_clusters: int = 256, iters: int = 4,
                    sample: int = 16384):
    """(observed, null) mean max centroid similarity of a sampled
    sub-k-means — a cheap (sub-0.1 s) predictor of whether the IVF scan
    will pass its quality gate, used by `build_graph_ivf` to skip the
    expensive cluster scan when the corpus would be gate-rejected anyway
    (without it, isotropic large-N builds would pay the failed IVF attempt
    ON TOP of the fallback scan).

    The NULL is the same statistic on a per-column shuffle of the sample:
    it keeps every marginal but destroys cross-dimension structure, so
    observed/null ~ 1 on isotropic corpora and >> 1 on clustered ones.
    An absolute bar is dimension-sensitive (the isotropic value measures
    ~0.43 at d=64 but ~0.17 at d=768 — a centroid of m near-orthogonal
    unit rows has ||c|| ~ 1/sqrt(m), which scales with C, sample and d);
    the self-calibrated ratio is not."""
    n, d = Y.shape
    stride = max(n // sample, 1)
    Ys = normalize_rows(Y[::stride][:sample].astype(jnp.float32))
    C = max(2, min(n_clusters, Ys.shape[0] // 8))
    obs = _kmeans_maxsim(Ys, C, iters, d)
    # per-column independent shuffle (argsort of iid uniforms per column)
    perm = jnp.argsort(
        jax.random.uniform(jax.random.PRNGKey(0), Ys.shape), axis=0
    )
    Ynull = normalize_rows(jnp.take_along_axis(Ys, perm, axis=0))
    null = _kmeans_maxsim(Ynull, C, iters, d)
    return obs, null


@partial(jax.jit, static_argnames=("k", "sample"))
def _sample_quality(Y: jax.Array, vals: jax.Array, idx: jax.Array, k: int,
                    sample: int = 256):
    """(id_recall, sim_gap_p99) on ``sample`` strided rows.

    In tight-cluster corpora the exact top-k is buried among thousands of
    near-ties (sims within ~1e-3); id recall is then a misleading metric —
    a neighbor whose similarity matches the true top-k to ~1e-2 yields an
    equivalent graph (weights differ below the row-cap scale).  The gap is
    computed per sorted slot: exact_topk_sims - chosen_sims."""
    n, d = Y.shape
    Yn = normalize_rows(Y.astype(jnp.float32))
    stride = max(n // sample, 1)
    rows = (jnp.arange(sample) * stride) % n
    # the reference scan MUST be exact: at default precision (bf16 passes)
    # its own noise is the size of max_sim_gap and the gate measures noise
    S = jnp.dot(
        Yn[rows], Yn.T, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    S = jnp.where(jnp.arange(n)[None, :] == rows[:, None], -jnp.inf, S)
    ex_vals, exact = lax.top_k(S, k)
    got = idx[rows]
    hit = (exact[:, :, None] == got[:, None, :]).any(-1)
    recall = jnp.mean(hit.astype(jnp.float32))
    # ex_vals is already descending (lax.top_k); only the scattered side
    # needs the sort
    got_sorted = jnp.sort(vals[rows], axis=1)[:, ::-1]
    gap = (ex_vals - got_sorted).reshape(-1)
    p99 = jnp.quantile(gap, 0.99)
    return recall, p99


def build_graph_ivf(
    Y: jax.Array,
    k: int,
    *,
    row_cap: float = 1.0,
    n_clusters: int = 1024,
    m_probe: int = 8,
    bucket_factor: float = 2.0,
    kmeans_iters: int = 6,
    overscan: int = 4,
    min_n: int = 65536,
    min_recall: float = 0.9,
    max_sim_gap: float = 0.01,
    patch_cap: int = 2048,
    balance_rounds: int = 3,
    balance_cands: int = 4,
    min_clusterability: float = 1.25,
    fallback_builder=None,
) -> tuple[Graph, dict]:
    """Clustered approximate graph build with dense-fast-scan fallback.

    Returns (Graph, info).  info["mode"] is "ivf" or "fallback-fast";
    fallback triggers when N < min_n, when bucket overflow exceeds the
    exact patch-scan capacity ``patch_cap``, when the geometry is
    degenerate (C*4 >= N), or when the sampled quality gate fails.  The
    quality gate accepts EITHER id recall >= ``min_recall`` OR a p99
    per-slot similarity gap <= ``max_sim_gap`` vs the exact top-k — tight
    clusters bury the exact top-k among near-ties where id recall is
    meaningless but the chosen neighbors are graph-equivalent; isotropic
    corpora fail BOTH (measured: id recall 0.27-0.62, gaps well above the
    bar) and correctly fall back."""
    n, d = Y.shape
    # fallbacks re-resolve auto WITHOUT the cluster tier: below
    # FAST_SIMILARITY_N that is the exact (recall-1.0) scan — hardcoding
    # "fast" here would silently downgrade small-N auto builds when a user
    # lowers OSCILLINK_CLUSTER_SIM_N below the fast threshold
    fb_mode = resolve_similarity(n, "auto")

    def _fallback(reason, **extra):
        # callers with a compiled build path (the lattice) supply
        # fallback_builder(mode) -> Graph so the fallback runs as ONE jitted
        # program — the module-level build_graph here dispatches eagerly,
        # which costs minutes of per-op RPC latency on tunneled runtimes
        if fallback_builder is not None:
            g = fallback_builder(fb_mode)
        else:
            g = build_graph(Y, k, row_cap=row_cap, similarity=fb_mode)
        return g, {"mode": f"fallback-{fb_mode}", "reason": reason, **extra}

    if n < min_n or n_clusters * 4 >= n:
        return _fallback("N below IVF threshold")

    # cheap pre-gate (~0.1 s sampled sub-k-means): skip the expensive
    # cluster scan on corpora that would be gate-rejected anyway.
    # ``min_clusterability`` is a RATIO vs the column-shuffled null (1.25
    # default: isotropic corpora sit at ~1.0 regardless of dimension);
    # 0 disables the pre-gate.
    obs = null = clus = None
    if min_clusterability > 0:  # 0 disables the pre-gate AND its probe cost
        obs, null = (float(v) for v in jax.device_get(_clusterability(Y)))
        clus = obs / max(null, 1e-6)
        if clus < min_clusterability:
            return _fallback(
                f"clusterability ratio {clus:.2f} < {min_clusterability} "
                f"(sampled mean max centroid sim {obs:.3f} vs shuffled-null "
                f"{null:.3f})",
                clusterability=round(obs, 4),
                clusterability_null=round(null, 4),
                clusterability_ratio=round(clus, 3),
            )

    P = _round_up(int(bucket_factor * n / n_clusters), 128)
    vals, idx, overflow, filled = ivf_topk(
        Y, k, n_clusters=n_clusters, bucket_cap=P, m_probe=m_probe,
        kmeans_iters=kmeans_iters, overscan=overscan, patch_cap=patch_cap,
        balance_rounds=balance_rounds, balance_cands=balance_cands,
    )
    recall_est, gap_p99 = _sample_quality(Y, vals, idx, k)
    ovf, rec, gap = (
        int(jax.device_get(overflow)),
        float(jax.device_get(recall_est)),
        float(jax.device_get(gap_p99)),
    )
    if ovf > 0 or (rec < min_recall and gap > max_sim_gap):
        # ANY patched row forces the fallback: patched rows are absent from
        # every bucket, so no bucketed row's candidate list can contain
        # them and graph_from_topk's mutual test isolates them entirely —
        # their exact patched neighbor lists notwithstanding.  Spillover
        # assignment (balance_rounds) makes ovf=0 the normal case; a
        # corpus that still overflows is one IVF serves badly anyway.
        reason = (
            f"{ovf} bucket-overflow rows would be isolated by the mutual "
            "test (patched rows are in no bucket)"
            if ovf > 0
            else f"sampled recall {rec:.3f} < {min_recall} and sim-gap p99 "
            f"{gap:.4f} > {max_sim_gap}"
        )
        return _fallback(reason, recall_estimate=rec, sim_gap_p99=gap)
    g = _jit_graph_from_topk(vals, idx, jnp.float32(row_cap))
    return g, {
        "mode": "ivf",
        "n_clusters": n_clusters,
        "bucket_cap": P,
        "m_probe": m_probe,
        "overscan": overscan,
        "balance_rounds": balance_rounds,
        "clusterability": round(obs, 4) if obs is not None else None,
        "clusterability_null": round(null, 4) if null is not None else None,
        "clusterability_ratio": round(clus, 3) if clus is not None else None,
        "overflow_patched": ovf,
        "recall_estimate": rec,
        "sim_gap_p99": gap,
    }
