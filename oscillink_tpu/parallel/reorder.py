"""Row reordering + halo analysis for sharded lattices.

The sharded CG's cross-chip traffic is the neighbor halo: the unique remote
rows each shard's gather touches.  For UNORDERED rows the halo approaches
the full row set (mutual-kNN neighbors land anywhere), which is why
`shardmap_cg` all-gathers.  Reordering rows so that embedding-space
neighbors get nearby indices shrinks the halo; this module provides

  * `pca_bisection_order(Y, levels)` — recursive principal-direction
    bisection (a cheap KD-style spatial sort that runs entirely on device:
    power-iteration PC per level, median split, recurse), and
  * `halo_stats(idx, w, n_shards)` — per-shard unique-remote-row counts,
    the decision metric for all-gather vs halo-exchange (``w`` filters the
    padding edges).

Measured effect (see tests + ROADMAP): on clustered data the halo collapses
by an order of magnitude; on isotropic random data high-D neighbors have no
1-D locality and reordering cannot help — the all-gather path remains
optimal there.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pca_bisection_order", "halo_stats", "apply_order"]


def _leading_direction(Yc: jax.Array, iters: int = 8) -> jax.Array:
    """Principal direction by power iteration on the CENTERED Gram matrix.

    ``Yc`` must be mean-subtracted: on uncentered data the leading
    eigenvector of Y^T Y is ~the corpus mean, every row projects to
    ~||mean||^2, and the median split orders rows by noise — exactly the
    clustered-but-offset geometry this module exists to serve."""
    d = Yc.shape[1]
    v = jnp.ones((d,), dtype=jnp.float32) / jnp.sqrt(d)

    def body(_, v):
        w = Yc.T @ (Yc @ v)
        return w / (jnp.linalg.norm(w) + 1e-12)

    return jax.lax.fori_loop(0, iters, body, v)


@jax.jit
def _segment_projection(Ys: jax.Array) -> jax.Array:
    """Projection of a segment onto its own centered principal direction.
    Module-level jit: per-call closures would re-trace/compile every
    segment shape on every request."""
    Yc = Ys - jnp.mean(Ys, axis=0, keepdims=True)
    return Yc @ _leading_direction(Yc)


def pca_bisection_order(Y: np.ndarray, levels: int = 3) -> np.ndarray:
    """Return a permutation ordering rows by recursive PCA bisection.

    Each level splits a segment at the median of its projection onto the
    segment's own principal direction; leaves stay projection-sorted.
    O(levels · N · D) — negligible next to the graph build.
    """
    Y = np.asarray(Y, dtype=np.float32)
    n = Y.shape[0]
    order = np.arange(n)

    def rec(ids: np.ndarray, depth: int) -> np.ndarray:
        if len(ids) <= 2:
            return ids
        proj = np.asarray(_segment_projection(jnp.asarray(Y[ids])))
        sorted_ids = ids[np.argsort(proj, kind="stable")]
        if depth >= levels:
            return sorted_ids
        mid = len(sorted_ids) // 2
        return np.concatenate(
            [rec(sorted_ids[:mid], depth + 1), rec(sorted_ids[mid:], depth + 1)]
        )

    return rec(order, 1)


def apply_order(order: np.ndarray, *arrays: np.ndarray):
    """Reorder row-indexed arrays; returns (reordered..., inverse_order)."""
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    return tuple(np.asarray(a)[order] for a in arrays) + (inv,)


def halo_stats(idx: np.ndarray, w: np.ndarray, n_shards: int) -> dict:
    """Per-shard halo sizes for a padded [N, K] neighbor structure.

    halo(s) = unique neighbor rows outside shard s that shard s's valid
    edges reference.  Returns totals plus the halo fraction (halo / shard
    rows) — the all-gather-vs-halo-exchange decision metric.
    """
    n = idx.shape[0]
    if n % n_shards != 0:
        raise ValueError(f"N={n} is not divisible by n_shards={n_shards}")
    rows_per = n // n_shards
    halos = []
    for s in range(n_shards):
        lo, hi = s * rows_per, (s + 1) * rows_per
        block_idx = idx[lo:hi]
        block_w = w[lo:hi]
        nbrs = np.unique(block_idx[block_w > 0])
        remote = nbrs[(nbrs < lo) | (nbrs >= hi)]
        halos.append(len(remote))
    halos = np.asarray(halos)
    return {
        "n_shards": n_shards,
        "rows_per_shard": rows_per,
        "halo_min": int(halos.min()),
        "halo_max": int(halos.max()),
        "halo_mean": float(halos.mean()),
        "halo_fraction_mean": float(halos.mean() / rows_per),
        "allgather_rows": n - rows_per,  # what the all-gather path moves
    }
