"""Sharded serving tier (VERDICT r1 item 8): above OSCILLINK_SHARDED_MIN_N
the service routes to the mesh-sharded path and still emits a full signed
receipt, and the sharded receipt matches the single-device path."""

import numpy as np
import pytest

from oscillink_tpu.core.receipts import verify_receipt
from oscillink_tpu.service import LocalClient


def _payload(n, d, seed=0, **opts):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = rng.standard_normal(d).astype(np.float32)
    return {
        "Y": Y.tolist(),
        "psi": psi.tolist(),
        "options": {"max_iters": 8, "tol": 1e-3, **opts},
    }


@pytest.fixture()
def client(monkeypatch):
    for var in (
        "OSCILLINK_API_KEYS",
        "OSCILLINK_KEY_TIERS",
        "OSCILLINK_KEY_NODE_UNITS_LIMIT",
        "OSCILLINK_MONTHLY_CAP",
        "OSCILLINK_RATE_LIMIT",
        "OSCILLINK_IP_RATE_LIMIT",
        "OSCILLINK_NATIVE_SMALL_N",
    ):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("OSCILLINK_RECEIPT_SECRET", "shard-secret")
    monkeypatch.setenv("OSCILLINK_MAX_NODES", "200000")
    # settings are lru-cached module-wide; a previous test's client may have
    # frozen them without the secret
    from oscillink_tpu.service import config

    config.get_settings.cache_clear()
    yield LocalClient()
    config.get_settings.cache_clear()


def test_sharded_path_matches_single_device(client, monkeypatch):
    """Same request served sharded vs single-device: identical state_sig,
    matching receipt quantities, identical null sets and bundle order."""
    p = _payload(512, 16, seed=7, bundle_k=5)

    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "0")
    monkeypatch.delenv("OSCILLINK_SHARDED_MIN_N", raising=False)
    r_dev = client.post("/v1/settle", json_body=p)
    assert r_dev.status_code == 200
    assert r_dev.json()["meta"]["backend"] == "device"

    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "256")
    r_sh = client.post("/v1/settle", json_body=p)
    assert r_sh.status_code == 200
    b_dev, b_sh = r_dev.json(), r_sh.json()
    assert b_sh["meta"]["backend"] == "sharded"
    assert b_sh["receipt"]["meta"]["mesh_devices"] == 8

    # state signatures agree across paths by construction
    assert b_sh["state_sig"] == b_dev["state_sig"]
    # receipt quantities match to solver/collective float-order tolerance
    for key in ("deltaH_total", "coh_drop_sum", "anchor_pen_sum", "query_term_sum"):
        assert b_sh["receipt"][key] == pytest.approx(b_dev["receipt"][key], rel=2e-3)
    # identical graphs -> identical null-point edge sets
    nulls_dev = {tuple(e["edge"]) for e in b_dev["receipt"]["null_points"]}
    nulls_sh = {tuple(e["edge"]) for e in b_sh["receipt"]["null_points"]}
    assert nulls_sh == nulls_dev
    # identical bundle pick order
    assert [e["id"] for e in b_sh["bundle"]] == [e["id"] for e in b_dev["bundle"]]
    # both receipts carry a verifying HMAC
    for body in (b_dev, b_sh):
        assert verify_receipt(body["receipt"], "shard-secret")


def test_sharded_path_signed_receipt_65k(client, monkeypatch):
    """N=65536 through the service on the 8-device CPU mesh: routed to the
    sharded tier, returns a complete signed receipt (the VERDICT r1 item 8
    done-criterion)."""
    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "8192")
    n, d = 65536, 8
    rng = np.random.default_rng(0)
    centers = 4.0 * rng.standard_normal((32, d)).astype(np.float32)
    Y = (
        centers[rng.integers(0, 32, size=n)] + 0.3 * rng.standard_normal((n, d))
    ).astype(np.float32)
    psi = rng.standard_normal(d).astype(np.float32)
    p = {
        "Y": Y.tolist(),
        "psi": psi.tolist(),
        "params": {"kneighbors": 4, "similarity": "fastest"},
        "options": {"max_iters": 10, "tol": 1e-3, "bundle_k": 8},
    }
    r = client.post("/v1/settle", json_body=p)
    assert r.status_code == 200
    body = r.json()
    assert body["meta"]["backend"] == "sharded"
    rec = body["receipt"]
    assert rec is not None
    assert rec["meta"]["mesh_devices"] == 8
    assert np.isfinite(rec["deltaH_total"])
    assert rec["deltaH_total"] >= 0.0
    assert rec["meta"]["state_sig"]
    assert verify_receipt(rec, "shard-secret")
    assert len(body["bundle"]) == 8
    assert rec["meta"]["null_points_summary"]["total_null_points"] >= 0


def test_sharded_chain_prior_matches_device(client, monkeypatch):
    """Chain-prior requests ride the sharded tier and match the
    single-device path (state_sig, deltaH)."""
    p = {**_payload(128, 8, seed=1), "chain": [0, 1, 2, 3], "params": {"lamP": 0.3}}

    monkeypatch.delenv("OSCILLINK_SHARDED_MIN_N", raising=False)
    r_dev = client.post("/v1/settle", json_body=p)
    assert r_dev.status_code == 200
    assert r_dev.json()["meta"]["backend"] == "device"

    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "64")
    r_sh = client.post("/v1/settle", json_body=p)
    assert r_sh.status_code == 200
    b_dev, b_sh = r_dev.json(), r_sh.json()
    assert b_sh["meta"]["backend"] == "sharded"
    assert b_sh["state_sig"] == b_dev["state_sig"]
    assert b_sh["receipt"]["deltaH_total"] == pytest.approx(
        b_dev["receipt"]["deltaH_total"], rel=2e-3
    )


def test_sharded_routing_exclusions(client, monkeypatch):
    """Seed-jitter requests stay on the single-device path even above
    threshold (host-exact neighbor selection)."""
    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "64")
    p = _payload(128, 8, seed=2)
    p["params"] = {"deterministic_k": False, "neighbor_seed": 7}
    r = client.post("/v1/settle", json_body=p)
    assert r.status_code == 200
    assert r.json()["meta"]["backend"] == "device"


def test_jobs_route_to_sharded_tier(client, monkeypatch):
    """Async jobs mirror the synchronous backend routing."""
    import time as _time

    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "64")
    p = _payload(128, 8, seed=5, bundle_k=3)
    r = client.post("/v1/jobs/settle", json_body=p)
    assert r.status_code == 202
    job_id = r.json()["job_id"]
    for _ in range(200):
        jr = client.get(f"/v1/jobs/{job_id}").json()
        if jr["status"] in {"done", "error"}:
            break
        _time.sleep(0.1)
    assert jr["status"] == "done", jr
    assert jr["result"]["backend"] == "sharded"
    assert jr["result"]["receipt"]["deltaH_total"] is not None
    assert len(jr["result"]["bundle"]) == 3


def test_bundle_endpoint_routes_sharded_with_cache(client, monkeypatch):
    """/v1/bundle above threshold runs on the mesh tier; the cache key is
    the same state signature the device path would produce."""
    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "64")
    p = {**_payload(256, 8, seed=6), "bundle_k": 4}
    r1 = client.post("/v1/bundle", json_body=p)
    assert r1.status_code == 200
    assert r1.headers["X-Cache"] == "MISS"
    assert r1.json()["meta"]["backend"] == "sharded"
    assert len(r1.json()["bundle"]) == 4
    r2 = client.post("/v1/bundle", json_body=p)
    assert r2.headers["X-Cache"] == "HIT"
    assert r2.json()["bundle"] == r1.json()["bundle"]

    # device-path signature for the same request matches the cache key
    monkeypatch.delenv("OSCILLINK_SHARDED_MIN_N", raising=False)
    r3 = client.post("/v1/bundle", json_body=p)
    assert r3.json()["state_sig"] == r1.json()["state_sig"]
    assert [e["id"] for e in r3.json()["bundle"]] == [
        e["id"] for e in r1.json()["bundle"]
    ]


def test_chain_receipt_endpoint_routes_sharded(client, monkeypatch):
    """/v1/chain/receipt above threshold computes under the mesh and matches
    the single-device verdict/z-scores."""
    p = {**_payload(256, 8, seed=8), "chain": [0, 3, 7, 11], "z_th": 2.5}

    monkeypatch.delenv("OSCILLINK_SHARDED_MIN_N", raising=False)
    r_dev = client.post("/v1/chain/receipt", json_body=p)
    assert r_dev.status_code == 200

    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "64")
    r_sh = client.post("/v1/chain/receipt", json_body=p)
    assert r_sh.status_code == 200
    b_dev, b_sh = r_dev.json(), r_sh.json()
    assert b_sh["meta"]["backend"] == "sharded"
    assert b_sh["state_sig"] == b_dev["state_sig"]
    cd, cs = b_dev["chain_receipt"], b_sh["chain_receipt"]
    assert cs["verdict"] == cd["verdict"]
    assert cs["weakest_link"]["edge"] == cd["weakest_link"]["edge"]
    assert cs["coherence_gain"] == pytest.approx(cd["coherence_gain"], rel=2e-3)
    for es, ed in zip(cs["edges"], cd["edges"]):
        assert es["z_struct"] == pytest.approx(ed["z_struct"], rel=1e-2, abs=1e-3)
        assert es["z_path"] == pytest.approx(ed["z_path"], rel=1e-2, abs=1e-3)


def test_sharded_validation_mirrors_device_400s(client, monkeypatch):
    """Shape/bounds errors must 400 on the sharded tier exactly like the
    device path, not become jit-time 500s after quota is charged."""
    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "64")
    monkeypatch.setenv("OSCILLINK_FEAT_DIFFUSION_GATES", "1")  # open access=free
    p = _payload(128, 8, seed=4)
    bad_gates = {**p, "gates": [1.0] * 127}
    assert client.post("/v1/settle", json_body=bad_gates).status_code == 400
    bad_psi = dict(p)
    bad_psi["psi"] = [0.0] * 9
    assert client.post("/v1/settle", json_body=bad_psi).status_code == 400
    bad_chain = {**p, "chain": [0, 500]}
    assert client.post("/v1/settle", json_body=bad_chain).status_code == 400
    r = client.post(
        "/v1/chain/receipt", json_body={**p, "chain": [0, 500], "z_th": 2.5}
    )
    assert r.status_code == 400


def test_sharded_chain_receipt_accepts_cluster_similarity(client, monkeypatch):
    """similarity='cluster' realizes as the fast scan on the sharded chain
    path (it used to raise the IVF-is-single-device ValueError -> 500)."""
    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "64")
    p = {**_payload(128, 8, seed=5), "chain": [0, 3, 7], "z_th": 2.5}
    p["params"] = {"similarity": "cluster"}
    r = client.post("/v1/chain/receipt", json_body=p)
    assert r.status_code == 200
    assert r.json()["meta"]["backend"] == "sharded"


def test_sharded_receipt_honors_null_cap(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "64")
    monkeypatch.setenv("OSCILLINK_RECEIPT_NULL_CAP", "2")
    rng = np.random.default_rng(9)
    n, d = 128, 8
    Y = rng.standard_normal((n, d)).astype(np.float32)
    Y[5] += 25.0  # anomalous rows force null points
    Y[60] -= 25.0
    p = {
        "Y": Y.tolist(),
        "psi": rng.standard_normal(d).astype(np.float32).tolist(),
        "options": {"max_iters": 8, "tol": 1e-3},
    }
    r = client.post("/v1/receipt", json_body=p)
    assert r.status_code == 200
    rec = r.json()["receipt"]
    summary = rec["meta"]["null_points_summary"]
    if summary["total_null_points"] > 2:
        assert summary["null_cap_applied"] is True
        assert len(rec["null_points"]) == 2
        zs = [e["z"] for e in rec["null_points"]]
        assert zs == sorted(zs, reverse=True) or len(set(zs)) < 2


def test_rerank_bundle_routes_off_sharded(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "64")
    p = _payload(128, 8, seed=6, bundle_k=5)
    p["options"]["bundle_diversify"] = False
    r = client.post("/v1/settle", json_body=p)
    assert r.status_code == 200
    assert r.json()["meta"]["backend"] == "device"
    scores = [e["score"] for e in r.json()["bundle"]]
    assert scores == sorted(scores, reverse=True)
    # MMR requests still ride the sharded tier
    p2 = _payload(128, 8, seed=6, bundle_k=5)
    r2 = client.post("/v1/settle", json_body=p2)
    assert r2.json()["meta"]["backend"] == "sharded"
