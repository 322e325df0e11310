"""Ragged batch settle: many different-size corpora in one padded batch,
bundles identical to serving each corpus alone (models/ragged.py)."""

import numpy as np
import pytest

from oscillink_tpu import Oscillink
from oscillink_tpu.models.ragged import bundle_ragged
from oscillink_tpu.service import LocalClient


def _corpus(n, d, seed):
    rng = np.random.default_rng(seed)
    centers = 2.0 * rng.standard_normal((4, d)).astype(np.float32)
    Y = (
        centers[rng.integers(0, 4, size=n)]
        + 0.4 * rng.standard_normal((n, d))
    ).astype(np.float32)
    psi = rng.standard_normal(d).astype(np.float32)
    return Y, psi


def test_ragged_bundles_match_standalone():
    d = 24
    sizes = [50, 130, 97]
    data = [_corpus(n, d, seed=i) for i, n in enumerate(sizes)]

    results = bundle_ragged(
        [Y for Y, _ in data],
        [p for _, p in data],
        kneighbors=6,
        bundle_k=5,
    )
    assert len(results) == 3
    for (Y, psi), res, n in zip(data, results, sizes):
        lat = Oscillink(Y, kneighbors=6)
        lat.set_query(psi)
        lat.settle(max_iters=12, tol=1e-3)
        ref = lat.bundle(k=5)
        assert res["n"] == n
        assert [e["id"] for e in res["bundle"]] == [e["id"] for e in ref]
        for got, want in zip(res["bundle"], ref):
            assert got["score"] == pytest.approx(want["score"], rel=1e-3, abs=1e-4)
            assert got["align"] == pytest.approx(want["align"], rel=1e-3, abs=1e-4)
        assert res["iters"] >= 1 and np.isfinite(res["res"])


def test_ragged_bundle_k_exceeds_smallest():
    d = 8
    data = [_corpus(n, d, seed=10 + i) for i, n in enumerate((9, 40))]
    results = bundle_ragged(
        [Y for Y, _ in data], [p for _, p in data], kneighbors=4, bundle_k=12
    )
    assert len(results[0]["bundle"]) == 9  # clamped to the corpus size
    assert len(results[1]["bundle"]) == 12
    ids0 = [e["id"] for e in results[0]["bundle"]]
    assert max(ids0) < 9  # padded rows never selected


def test_ragged_endpoint(monkeypatch):
    for var in ("OSCILLINK_API_KEYS", "OSCILLINK_RATE_LIMIT", "OSCILLINK_MONTHLY_CAP"):
        monkeypatch.delenv(var, raising=False)
    client = LocalClient()
    d = 12
    data = [_corpus(n, d, seed=20 + i) for i, n in enumerate((30, 75))]
    r = client.post(
        "/v1/bundle/ragged",
        json_body={
            "corpora": [Y.tolist() for Y, _ in data],
            "psis": [p.tolist() for _, p in data],
            "bundle_k": 4,
            "params": {"kneighbors": 5},
        },
    )
    assert r.status_code == 200
    body = r.json()
    assert body["corpora"] == 2
    assert body["meta"]["Ns"] == [30, 75]
    assert len(body["results"]) == 2
    for res in body["results"]:
        assert len(res["bundle"]) == 4
        assert all(e["id"] < res["n"] for e in res["bundle"])


def test_ragged_tiny_corpus_does_not_clamp_others():
    """A corpus smaller than k clamps only its own graph; larger lanes keep
    their full k and still match standalone serving."""
    d = 16
    tiny_Y, tiny_psi = _corpus(4, d, seed=30)  # k_eff = 3
    big_Y, big_psi = _corpus(80, d, seed=31)  # k_eff = 6
    results = bundle_ragged(
        [tiny_Y, big_Y], [tiny_psi, big_psi], kneighbors=6, bundle_k=5
    )
    lat = Oscillink(big_Y, kneighbors=6)
    lat.set_query(big_psi)
    lat.settle(max_iters=12, tol=1e-3)
    ref = lat.bundle(k=5)
    assert [e["id"] for e in results[1]["bundle"]] == [e["id"] for e in ref]
    assert len(results[0]["bundle"]) == 4


def test_ragged_gates_and_validation(monkeypatch):
    """Per-corpus gates apply; mismatched D and empty corpora are rejected."""
    for var in ("OSCILLINK_API_KEYS", "OSCILLINK_RATE_LIMIT", "OSCILLINK_MONTHLY_CAP"):
        monkeypatch.delenv(var, raising=False)
    client = LocalClient()
    d = 8
    (Y0, p0), (Y1, p1) = [_corpus(n, d, seed=40 + i) for i, n in enumerate((20, 30))]
    gates0 = np.zeros(20, dtype=np.float32)
    gates0[:3] = 1.0  # only the first three nodes feel the query
    r = client.post(
        "/v1/bundle/ragged",
        json_body={
            "corpora": [Y0.tolist(), Y1.tolist()],
            "psis": [p0.tolist(), p1.tolist()],
            "gates": [gates0.tolist(), None],
            "bundle_k": 3,
        },
    )
    assert r.status_code == 200

    # D mismatch rejected
    bad = client.post(
        "/v1/bundle/ragged",
        json_body={
            "corpora": [Y0.tolist(), np.zeros((4, d + 1)).tolist()],
            "psis": [p0.tolist(), p1.tolist()],
        },
    )
    assert bad.status_code == 400
    # empty corpora rejected
    bad2 = client.post(
        "/v1/bundle/ragged", json_body={"corpora": [], "psis": []}
    )
    assert bad2.status_code == 400
