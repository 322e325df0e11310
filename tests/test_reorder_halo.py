"""PCA-bisection reordering + halo statistics."""

import numpy as np
import jax

from oscillink_tpu.ops.graph import build_graph
from oscillink_tpu.parallel.reorder import (
    apply_order,
    halo_stats,
    pca_bisection_order,
)


def _graph_idx(Y, k):
    import jax.numpy as jnp

    g = jax.jit(lambda Y: build_graph(Y, k))(jnp.asarray(Y))
    return np.asarray(g.idx), np.asarray(g.w)


def test_order_is_permutation():
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((257, 16)).astype(np.float32)
    order = pca_bisection_order(Y, levels=3)
    assert sorted(order.tolist()) == list(range(257))


def test_apply_order_inverse():
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((64, 8)).astype(np.float32)
    order = pca_bisection_order(Y)
    (Y2, inv) = apply_order(order, Y)
    np.testing.assert_array_equal(Y2[inv], Y)


def test_halo_shrinks_on_clustered_data():
    """Clustered corpora: reordering collapses the halo; the metric must
    reflect it (the decision between all-gather and halo exchange)."""
    rng = np.random.default_rng(2)
    n, d, k, shards = 2048, 32, 6, 8
    centers = 4.0 * rng.standard_normal((shards * 2, d)).astype(np.float32)
    assign = rng.integers(0, len(centers), size=n)
    Y = centers[assign] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)

    idx_r, w_r = _graph_idx(Y, k)
    before = halo_stats(idx_r, w_r, shards)

    order = pca_bisection_order(Y, levels=4)
    (Y_sorted, _inv) = apply_order(order, Y)
    idx_s, w_s = _graph_idx(Y_sorted, k)
    after = halo_stats(idx_s, w_s, shards)

    assert after["halo_mean"] < 0.5 * before["halo_mean"]
    assert after["halo_fraction_mean"] < 0.6


def test_halo_random_data_stays_global():
    """Isotropic random data: no 1-D locality exists; the stats must expose
    that (halo ~ full remote set) so callers keep the all-gather path."""
    rng = np.random.default_rng(3)
    Y = rng.standard_normal((1024, 64)).astype(np.float32)
    idx, w = _graph_idx(Y, 6)
    stats = halo_stats(idx, w, 8)
    # neighbors spread over all shards: halo is a large share of the graph
    assert stats["halo_mean"] > 0.3 * stats["allgather_rows"] * 0.1
    order = pca_bisection_order(Y, levels=4)
    (Y_sorted, _inv) = apply_order(order, Y)
    idx_s, w_s = _graph_idx(Y_sorted, 6)
    stats_s = halo_stats(idx_s, w_s, 8)
    # reordering can't manufacture locality that isn't there
    assert stats_s["halo_mean"] > 0.5 * stats["halo_mean"]


def test_halo_shrinks_on_offset_clusters():
    """Clusters sharing a large common offset: the leading eigenvector of
    the UNcentered Gram matrix is ~the offset, so pre-fix the split ordered
    rows by noise and the halo stayed global — centering must recover the
    cluster structure (review finding)."""
    rng = np.random.default_rng(7)
    n, d, k, shards = 2048, 32, 6, 8
    offset = 20.0 * np.ones(d, dtype=np.float32)  # ||c|| >> cluster spread
    centers = 3.0 * rng.standard_normal((shards * 2, d)).astype(np.float32)
    assign = rng.integers(0, len(centers), size=n)
    Y = offset + centers[assign] + 0.3 * rng.standard_normal((n, d)).astype(
        np.float32
    )

    order = pca_bisection_order(Y, levels=4)
    (Y_sorted, _inv) = apply_order(order, Y)
    idx_s, w_s = _graph_idx(Y_sorted, k)
    after = halo_stats(idx_s, w_s, shards)
    idx_r, w_r = _graph_idx(Y, k)
    before = halo_stats(idx_r, w_r, shards)
    assert after["halo_mean"] < 0.5 * before["halo_mean"]
