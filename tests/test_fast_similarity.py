"""Two-pass fast similarity build agrees with the exact build."""

import numpy as np
import jax
import jax.numpy as jnp

from oscillink_tpu.ops.graph import build_graph


def test_lattice_similarity_mode():
    from oscillink_tpu import OscillinkLattice

    rng = np.random.default_rng(1)
    Y = rng.standard_normal((40, 12)).astype(np.float32)
    lat_e = OscillinkLattice(Y, kneighbors=4)
    lat_f = OscillinkLattice(Y, kneighbors=4, similarity="fast")
    # small N uses the dense path either way — same graph, distinct signature
    assert lat_e.adjacency_fingerprint() == lat_f.adjacency_fingerprint()
    assert lat_e._signature() != lat_f._signature()
    import pytest

    with pytest.raises(ValueError):
        OscillinkLattice(Y, similarity="bogus")
    lat_f.rebuild_graph(similarity="exact")
    assert lat_f._signature() == lat_e._signature()


def test_service_similarity_param():
    from oscillink_tpu.service import LocalClient

    rng = np.random.default_rng(2)
    Y = rng.standard_normal((24, 8)).astype(np.float32)
    psi = rng.standard_normal(8).astype(np.float32)
    c = LocalClient()
    r = c.post(
        "/v1/settle",
        json_body={
            "Y": Y.tolist(),
            "psi": psi.tolist(),
            "params": {"similarity": "fast"},
        },
    )
    assert r.status_code == 200
    r2 = c.post(
        "/v1/settle",
        json_body={"Y": Y.tolist(), "params": {"similarity": "nope"}},
    )
    assert r2.status_code == 422


def test_fast_build_matches_exact_blocked():
    rng = np.random.default_rng(0)
    N, D, K = 600, 32, 6
    Y = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    # force the blocked paths with a small dense_limit and block size
    g_exact = jax.jit(
        lambda Y: build_graph(Y, K, dense_limit=64, block_rows=128)
    )(Y)
    g_fast = jax.jit(
        lambda Y: build_graph(Y, K, dense_limit=64, block_rows=128, similarity="fast")
    )(Y)
    idx_e = np.sort(np.asarray(g_exact.idx), axis=1)
    idx_f = np.sort(np.asarray(g_fast.idx), axis=1)
    # neighbor sets agree on (nearly) every row; weights exact where they do
    agree_rows = (idx_e == idx_f).all(axis=1)
    assert agree_rows.mean() > 0.999
    w_e = np.sort(np.asarray(g_exact.w), axis=1)[agree_rows]
    w_f = np.sort(np.asarray(g_fast.w), axis=1)[agree_rows]
    np.testing.assert_allclose(w_f, w_e, rtol=1e-5, atol=1e-6)


# -- similarity="auto": N-thresholded routing (default in serving/sharded) --


def test_resolve_similarity_auto_threshold(monkeypatch):
    from oscillink_tpu.ops.graph import FAST_SIMILARITY_N, resolve_similarity

    monkeypatch.delenv("OSCILLINK_FAST_SIM_N", raising=False)
    assert resolve_similarity(1000, "auto") == "exact"
    assert resolve_similarity(FAST_SIMILARITY_N, "auto") == "exact"
    assert resolve_similarity(FAST_SIMILARITY_N + 1, "auto") == "fast"
    # concrete modes pass through regardless of N
    assert resolve_similarity(10**7, "exact") == "exact"
    assert resolve_similarity(10, "fastest") == "fastest"
    # env override
    monkeypatch.setenv("OSCILLINK_FAST_SIM_N", "100")
    assert resolve_similarity(101, "auto") == "fast"
    assert resolve_similarity(100, "auto") == "exact"


def test_lattice_auto_resolves_and_documents_recall(monkeypatch):
    from oscillink_tpu.core.lattice import OscillinkLattice

    rng = np.random.default_rng(5)
    Y = rng.standard_normal((120, 16)).astype(np.float32)

    lat = OscillinkLattice(Y, kneighbors=4, similarity="auto")
    assert lat._similarity == "exact"  # small N -> exact
    lat.set_query(np.zeros(16, dtype=np.float32))
    rec = lat.receipt()
    assert rec["meta"]["similarity"] == "exact"
    assert rec["meta"]["similarity_recall_target"] == 1.0

    # low threshold: auto routes to fast and the receipt documents it
    monkeypatch.setenv("OSCILLINK_FAST_SIM_N", "64")
    lat2 = OscillinkLattice(Y, kneighbors=4, similarity="auto")
    assert lat2._similarity == "fast"
    lat2.set_query(np.zeros(16, dtype=np.float32))
    rec2 = lat2.receipt()
    assert rec2["meta"]["similarity"] == "fast"
    assert rec2["meta"]["similarity_recall_target"] == 0.99


def test_service_default_similarity_is_auto():
    from oscillink_tpu.service.models import Params

    assert Params().similarity == "auto"
