"""IVF clustered graph build (ops/ivf.py): recall on clustered data, the
overflow and recall gates, and the lattice similarity="cluster" wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oscillink_tpu.ops.graph import normalize_rows
from oscillink_tpu.ops.ivf import build_graph_ivf, ivf_topk


def _clustered(n_clusters=32, per=256, d=64, seed=0, spread=0.5):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 5
    return np.concatenate(
        [c + spread * rng.standard_normal((per, d)).astype(np.float32)
         for c in centers]
    )


def _exact_topk_ids(Y, k):
    Yn = np.asarray(normalize_rows(jnp.asarray(Y)))
    S = Yn @ Yn.T
    np.fill_diagonal(S, -np.inf)
    return np.argsort(-S, axis=1)[:, :k]


def test_ivf_recall_on_clustered_data():
    Y = _clustered()
    n, k = Y.shape[0], 8
    vals, idx, ovf, filled = ivf_topk(
        jnp.asarray(Y), k, n_clusters=32, bucket_cap=384, m_probe=4
    )
    assert int(ovf) == 0 and int(filled.sum()) == n
    exact = _exact_topk_ids(Y, k)
    idx_h = np.asarray(idx)
    recall = np.mean(
        [len(set(exact[i]) & set(idx_h[i])) / k for i in range(n)]
    )
    assert recall > 0.97, recall
    # selected weights are exact f32 similarities
    Yn = np.asarray(normalize_rows(jnp.asarray(Y)))
    i = 17
    for slot in range(k):
        j = int(idx_h[i, slot])
        assert float(np.asarray(vals)[i, slot]) == pytest.approx(
            float(Yn[i] @ Yn[j]), abs=1e-5
        )


def test_recall_gate_falls_back_on_isotropic():
    rng = np.random.default_rng(1)
    Y = jnp.asarray(rng.standard_normal((8192, 64)).astype(np.float32))
    # default path: the cheap clusterability pre-gate fires first
    g, info = build_graph_ivf(Y, 8, n_clusters=32, m_probe=4, min_n=1000)
    assert info["mode"].startswith("fallback-")
    assert "clusterability" in info["reason"]
    # with the pre-gate disabled the sampled recall/sim-gap gate still
    # protects quality (the original acceptance bar)
    g, info = build_graph_ivf(
        Y, 8, n_clusters=32, m_probe=4, min_n=1000, min_clusterability=0.0
    )
    assert info["mode"].startswith("fallback-")
    assert "recall" in info["reason"]


def test_overflow_gate_falls_back():
    Y = jnp.asarray(_clustered(seed=2))
    g, info = build_graph_ivf(
        Y, 8, n_clusters=32, m_probe=4, bucket_factor=0.5, min_n=1000
    )
    assert info["mode"].startswith("fallback-")
    assert "overflow" in info["reason"]


def test_small_n_falls_back():
    rng = np.random.default_rng(3)
    Y = jnp.asarray(rng.standard_normal((256, 16)).astype(np.float32))
    g, info = build_graph_ivf(Y, 4)
    assert info["mode"].startswith("fallback-")


def test_lattice_cluster_mode(monkeypatch):
    """similarity='cluster' end-to-end through the container: the realized
    mode lands in receipt meta and the lattice settles normally."""
    from oscillink_tpu.core.lattice import OscillinkLattice
    from oscillink_tpu.ops import ivf as ivf_mod

    Y = _clustered(n_clusters=8, per=64, d=32, seed=4)
    # test-sized geometry (the production default min_n is 65536)
    orig = ivf_mod.build_graph_ivf

    def small(Yd, k, **kw):
        kw.update(n_clusters=8, m_probe=4, min_n=256)
        return orig(Yd, k, **kw)

    monkeypatch.setattr(ivf_mod, "build_graph_ivf", small)
    lat = OscillinkLattice(Y, kneighbors=6, similarity="cluster")
    lat.set_query(np.zeros(32, dtype=np.float32))
    lat.settle(max_iters=10, tol=1e-3)
    rec = lat.receipt()
    assert rec["meta"]["similarity"] == "cluster"
    info = rec["meta"]["similarity_info"]
    assert info["mode"] == "ivf" or info["mode"].startswith("fallback-")
    if info["mode"] == "ivf":
        assert info["recall_estimate"] > 0.9
    assert np.isfinite(rec["deltaH_total"])


def test_overflow_rows_get_patched_neighbors():
    """Rows past a bucket cap must receive exact-scan neighbors, not empty
    lists (the patch pass)."""
    Y = _clustered(n_clusters=8, per=256, d=32, seed=7)
    n, k = Y.shape[0], 6
    # tiny caps: most rows overflow, all within patch_cap
    vals, idx, ovf, filled = ivf_topk(
        jnp.asarray(Y), k, n_clusters=8, bucket_cap=128, m_probe=4,
        patch_cap=2048,
    )
    assert int(ovf) > 0
    assert bool(filled.all())  # every row filled after patching
    exact = _exact_topk_ids(Y, k)
    idx_h = np.asarray(idx)
    recall = np.mean([len(set(exact[i]) & set(idx_h[i])) / k for i in range(n)])
    # here HALF the corpus overflowed (cap 128 vs cluster size 256), so
    # overflow rows are patched as queries but still missing as candidates
    # for bucket rows — recall degrades gracefully instead of rows losing
    # all neighbors.  Production overflow rates are ~0.1% (see
    # benchmarks/ivf_1m.json) where this effect is negligible; the sampled
    # quality gate catches real damage either way.
    assert recall > 0.7, recall
    # and no row is left with an empty neighbor list
    assert (np.asarray(vals).max(axis=1) > 0).all()


def test_balanced_assignment_bounds_overflow():
    """Capacity-constrained spillover: on skewed data (one dominant mode)
    plain argmax assignment overflows the dominant bucket; the balancing
    rounds hard-bound occupancy by spilling least-central rows to their
    next-nearest clusters, and patched/bucketed rows keep real neighbors."""
    rng = np.random.default_rng(11)
    d = 32
    # one dominant mode (1024 rows) + 7 small modes (128 rows each)
    centers = rng.standard_normal((8, d)).astype(np.float32) * 5
    parts = [centers[0] + 0.5 * rng.standard_normal((1024, d)).astype(np.float32)]
    for c in centers[1:]:
        parts.append(c + 0.5 * rng.standard_normal((128, d)).astype(np.float32))
    Y = jnp.asarray(np.concatenate(parts))
    n, k = Y.shape[0], 6

    _, _, ovf0, _ = ivf_topk(
        Y, k, n_clusters=8, bucket_cap=256, m_probe=4, balance_rounds=0
    )
    vals, idx, ovf3, filled = ivf_topk(
        Y, k, n_clusters=8, bucket_cap=256, m_probe=4, balance_rounds=3
    )
    assert int(ovf0) >= 512  # dominant bucket overflows without balancing
    assert int(ovf3) <= int(ovf0) // 4  # spillover absorbs the bulk
    assert bool(filled.all())
    exact = _exact_topk_ids(np.asarray(Y), k)
    idx_h = np.asarray(idx)
    recall = np.mean([len(set(exact[i]) & set(idx_h[i])) / k for i in range(n)])
    assert recall > 0.8, recall


def test_clusterability_pregate_skips_isotropic():
    """Isotropic corpora must fall back via the cheap sampled pre-gate —
    without ever paying the cluster scan (which would be gate-rejected).
    The gate is the RATIO vs a column-shuffled null, so it holds at any
    dimension (an absolute bar is dimension-sensitive)."""
    from oscillink_tpu.ops.ivf import _clusterability

    rng = np.random.default_rng(21)
    for d in (64, 128):
        iso = jnp.asarray(rng.standard_normal((8192, d)).astype(np.float32))
        obs_i, null_i = (float(v) for v in _clusterability(iso, n_clusters=64,
                                                           sample=4096))
        clustered = jnp.asarray(
            _clustered(n_clusters=16, per=512, d=d, seed=22)
        )
        obs_c, null_c = (float(v) for v in _clusterability(
            clustered, n_clusters=64, sample=4096))
        assert obs_i / null_i < 1.25 < obs_c / null_c, (
            d, obs_i, null_i, obs_c, null_c
        )

    g, info = build_graph_ivf(iso, 8, n_clusters=32, m_probe=4, min_n=1000)
    assert info["mode"].startswith("fallback-")
    assert "clusterability" in info["reason"]


def test_auto_resolves_to_cluster_above_threshold(monkeypatch):
    from oscillink_tpu.ops.graph import resolve_similarity

    monkeypatch.setenv("OSCILLINK_CLUSTER_SIM_N", "500000")
    assert resolve_similarity(1_000_000, "auto", allow_cluster=True) == "cluster"
    assert resolve_similarity(1_000_000, "auto") == "fast"  # sharded tiers
    assert resolve_similarity(100_000, "auto", allow_cluster=True) == "fast"
    assert resolve_similarity(1_000, "auto", allow_cluster=True) == "exact"
    monkeypatch.setenv("OSCILLINK_CLUSTER_SIM_N", "0")  # kill switch
    assert resolve_similarity(1_000_000, "auto", allow_cluster=True) == "fast"
    # concrete modes pass through
    assert resolve_similarity(1_000_000, "exact", allow_cluster=True) == "exact"


def test_lattice_auto_routes_cluster(monkeypatch):
    """auto -> cluster above the env threshold, with the realized mode (and
    fallback info when the gates fire) in receipt meta."""
    from oscillink_tpu.core.lattice import OscillinkLattice
    from oscillink_tpu.ops import ivf as ivf_mod

    Y = _clustered(n_clusters=8, per=64, d=32, seed=31)
    monkeypatch.setenv("OSCILLINK_CLUSTER_SIM_N", "256")
    orig = ivf_mod.build_graph_ivf

    def small(Yd, k, **kw):
        kw.update(n_clusters=8, m_probe=4, min_n=256)
        return orig(Yd, k, **kw)

    monkeypatch.setattr(ivf_mod, "build_graph_ivf", small)
    lat = OscillinkLattice(Y, kneighbors=6, similarity="auto")
    assert lat._similarity == "cluster"
    lat.set_query(np.zeros(32, dtype=np.float32))
    lat.settle(max_iters=8, tol=1e-3)
    rec = lat.receipt()
    assert rec["meta"]["similarity"] == "cluster"
    m = rec["meta"]["similarity_info"]["mode"]
    assert m == "ivf" or m.startswith("fallback-")


def test_small_cluster_count_does_not_crash():
    """Regression: balance_cands > n_clusters must not crash lax.top_k
    (R is capped at C), and C=1 skips balancing entirely."""
    Y = jnp.asarray(_clustered(n_clusters=4, per=64, d=16, seed=41))
    vals, idx, ovf, filled = ivf_topk(
        Y, 4, n_clusters=3, bucket_cap=128, m_probe=2, balance_cands=4
    )
    assert vals.shape == (Y.shape[0], 4)
    ivf_topk(Y, 4, n_clusters=1, bucket_cap=256, m_probe=1, balance_cands=4)


def test_fallback_honors_exact_contract_at_small_n(monkeypatch):
    """A lowered OSCILLINK_CLUSTER_SIM_N must not silently downgrade small
    auto builds: below FAST_SIMILARITY_N the IVF fallback re-resolves to
    the exact (recall-1.0) scan, not 'fast'."""
    rng = np.random.default_rng(51)
    Y = jnp.asarray(rng.standard_normal((512, 32)).astype(np.float32))
    g, info = build_graph_ivf(Y, 6)  # n < min_n -> fallback
    assert info["mode"] == "fallback-exact"
