"""Small-N native serving fast path through the service API."""

import numpy as np
import pytest

from oscillink_tpu.native import native_available
from oscillink_tpu.service import LocalClient

pytestmark = pytest.mark.skipif(not native_available(), reason="native build unavailable")


def _payload(n=24, d=8, seed=0, **opts):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = rng.standard_normal(d).astype(np.float32)
    return {
        "Y": Y.tolist(),
        "psi": psi.tolist(),
        "options": {"max_iters": 12, "tol": 1e-3, **opts},
    }


@pytest.fixture()
def client(monkeypatch):
    for var in ("OSCILLINK_API_KEYS", "OSCILLINK_RECEIPT_SECRET"):
        monkeypatch.delenv(var, raising=False)
    return LocalClient()


def test_native_path_serves_small_requests(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    r = client.post("/v1/settle", json_body=_payload(n=24))
    assert r.status_code == 200
    body = r.json()
    assert body["meta"]["backend"] == "native"
    assert body["receipt"]["meta"]["backend"] == "native"
    assert np.isfinite(body["receipt"]["deltaH_total"])


def test_device_path_above_threshold(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "8")
    r = client.post("/v1/settle", json_body=_payload(n=24))
    assert r.status_code == 200
    assert r.json()["meta"]["backend"] == "device"


def test_chain_requests_serve_natively(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    p = {**_payload(n=24), "chain": [0, 1, 2], "params": {"lamP": 0.2}}
    r = client.post("/v1/settle", json_body=p)
    assert r.status_code == 200
    body = r.json()
    assert body["meta"]["backend"] == "native"
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "0")
    rd = client.post("/v1/settle", json_body=p).json()
    dn, dd = body["receipt"]["deltaH_total"], rd["receipt"]["deltaH_total"]
    assert abs(dn - dd) <= max(1e-2, 5e-3 * abs(dd))


def test_native_and_device_agree(client, monkeypatch):
    p = _payload(n=32, d=10, seed=7)
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    rn = client.post("/v1/settle", json_body=p).json()
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "0")
    rd = client.post("/v1/settle", json_body=p).json()
    # same state signature across backends (shared token scheme)
    assert rn["state_sig"] == rd["state_sig"]
    dn, dd = rn["receipt"]["deltaH_total"], rd["receipt"]["deltaH_total"]
    assert abs(dn - dd) <= max(1e-2, 5e-3 * abs(dd))


def test_native_bundle_matches_device(client, monkeypatch):
    p = {**_payload(n=32, d=10, seed=9), "options": {"bundle_k": 5}}
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    bn = client.post("/v1/settle", json_body=p).json()["bundle"]
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "0")
    bd = client.post("/v1/settle", json_body=p).json()["bundle"]
    assert [e["id"] for e in bn] == [e["id"] for e in bd]


def test_native_rerank_bundle_matches_device(client, monkeypatch):
    """diversify=False (rerank mode) now serves natively: pure top-k by
    score with lowest-index tie-break, same as the device lax.top_k."""
    p = {
        **_payload(n=32, d=10, seed=11),
        "options": {"bundle_k": 5, "bundle_diversify": False},
    }
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    rn = client.post("/v1/settle", json_body=p).json()
    assert rn["meta"]["backend"] == "native"
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "0")
    rd = client.post("/v1/settle", json_body=p).json()
    assert rd["meta"]["backend"] == "device"
    assert [e["id"] for e in rn["bundle"]] == [e["id"] for e in rd["bundle"]]


def test_diffusion_requests_stay_on_device_by_default(client, monkeypatch):
    """Derived diffusion gates feed the state signature, and the native CG
    agrees with the JAX derivation only to ~1e-4 — so by default diffusion
    requests take the device path even below the native threshold (a
    replica-dependent state_sig would split signed receipts and the
    bundle cache)."""
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    monkeypatch.setenv("OSCILLINK_FEAT_DIFFUSION_GATES", "1")
    payload = _payload(n=24, include_receipt=True)
    payload["diffusion"] = {"enable": True, "beta": 1.0, "gamma": 0.1}
    r = client.post("/v1/settle", json_body=payload)
    assert r.status_code == 200
    assert r.json()["meta"]["backend"] == "device"


def test_diffusion_requests_serve_natively_on_opt_in(client, monkeypatch):
    """With OSCILLINK_NATIVE_DIFFUSION=1 (single-backend deployments) the
    engine derives the gates with the same screened-Poisson CG over its
    own graph (engine.cpp osc_diffusion_solve)."""
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    monkeypatch.setenv("OSCILLINK_NATIVE_DIFFUSION", "1")
    monkeypatch.setenv("OSCILLINK_FEAT_DIFFUSION_GATES", "1")
    payload = _payload(n=24, include_receipt=True)
    payload["diffusion"] = {"enable": True, "beta": 1.0, "gamma": 0.1}
    r = client.post("/v1/settle", json_body=payload)
    assert r.status_code == 200
    body = r.json()
    assert body["meta"]["backend"] == "native"
    meta = body["receipt"]["meta"]
    # derived gates are non-uniform (a real query produces a spread)
    assert meta["gates_uniform"] is False
    assert 0.0 <= meta["gates_min"] <= meta["gates_max"] <= 1.0


def test_diffusion_native_agrees_with_device(client, monkeypatch):
    """Same diffusion request through both backends: deltaH must agree."""
    monkeypatch.setenv("OSCILLINK_NATIVE_DIFFUSION", "1")
    monkeypatch.setenv("OSCILLINK_FEAT_DIFFUSION_GATES", "1")
    payload = _payload(n=24, include_receipt=True)
    payload["params"] = {"deterministic_k": True}
    payload["diffusion"] = {"enable": True, "beta": 1.0, "gamma": 0.1}

    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    r_native = client.post("/v1/settle", json_body=payload)
    assert r_native.json()["meta"]["backend"] == "native"

    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "0")
    r_device = client.post("/v1/settle", json_body=payload)
    assert r_device.json()["meta"]["backend"] == "device"

    dh_n = r_native.json()["receipt"]["deltaH_total"]
    dh_d = r_device.json()["receipt"]["deltaH_total"]
    assert abs(dh_n - dh_d) / (abs(dh_d) + 1e-9) < 5e-3


def test_bundle_endpoint_routes_native(client, monkeypatch):
    """/v1/bundle mirrors the settle routing: small N serves on the host
    engine, both modes, with the bundle cache keyed by the same state_sig
    scheme as the device/sharded branches."""
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    p = {**_payload(n=32, d=10, seed=21), "bundle_k": 5, "alpha": 0.6}
    r1 = client.post("/v1/bundle", json_body=p)
    assert r1.status_code == 200
    b1 = r1.json()
    assert b1["meta"]["backend"] == "native"
    assert b1["meta"]["cache"] == "MISS"
    r2 = client.post("/v1/bundle", json_body=p)
    assert r2.json()["meta"]["cache"] == "HIT"
    assert r2.json()["bundle"] == b1["bundle"]

    # device parity: same picks through the device path
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "0")
    rd = client.post("/v1/bundle", json_body=p)
    assert rd.json()["meta"].get("backend", "device") != "native"
    assert [e["id"] for e in rd.json()["bundle"]] == [e["id"] for e in b1["bundle"]]
    # signatures agree across backends (same token scheme)
    assert rd.json()["state_sig"] == b1["state_sig"]


def test_bundle_endpoint_native_rerank_mode(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    p = {
        **_payload(n=32, d=10, seed=22),
        "bundle_k": 5,
        "diversify": False,
    }
    rn = client.post("/v1/bundle", json_body=p)
    assert rn.json()["meta"]["backend"] == "native"
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "0")
    rd = client.post("/v1/bundle", json_body=p)
    assert [e["id"] for e in rn.json()["bundle"]] == [
        e["id"] for e in rd.json()["bundle"]
    ]


def test_chain_receipt_endpoint_routes_native(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    p = {**_payload(n=28, d=8, seed=31), "chain": [0, 3, 7, 11],
         "params": {"deterministic_k": True}}
    rn = client.post("/v1/chain/receipt", json_body=p)
    assert rn.status_code == 200
    bn = rn.json()
    assert bn["meta"]["backend"] == "native"
    cr = bn["chain_receipt"]
    assert set(cr) >= {"verdict", "weakest_link", "coherence_gain", "edges"}
    assert len(cr["edges"]) == 3

    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "0")
    rd = client.post("/v1/chain/receipt", json_body=p)
    cd = rd.json()["chain_receipt"]
    assert cr["verdict"] == cd["verdict"]
    assert bn["state_sig"] == rd.json()["state_sig"]
    for en, ed in zip(cr["edges"], cd["edges"]):
        assert abs(en["z_struct"] - ed["z_struct"]) <= max(
            2e-3, 2e-3 * abs(ed["z_struct"])
        )


def test_batch_endpoint_routes_native(client, monkeypatch):
    """/v1/settle/batch at small N: graph built once on the host engine,
    per-query solves native; bundles match the device vmapped path."""
    rng = np.random.default_rng(41)
    Y = rng.standard_normal((30, 8)).astype(np.float32)
    psis = rng.standard_normal((3, 8)).astype(np.float32)
    p = {"Y": Y.tolist(), "psis": psis.tolist(), "bundle_k": 4,
         "params": {"deterministic_k": True}}

    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    rn = client.post("/v1/settle/batch", json_body=p)
    assert rn.status_code == 200
    bn = rn.json()
    assert bn["meta"]["backend"] == "native"
    assert bn["queries"] == 3 and len(bn["bundles"]) == 3

    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "0")
    rd = client.post("/v1/settle/batch", json_body=p)
    bd = rd.json()
    assert bd["meta"].get("backend") is None  # device branch carries no tag
    for qn, qd in zip(bn["bundles"], bd["bundles"]):
        assert [e["id"] for e in qn] == [e["id"] for e in qd]


def test_batch_endpoint_native_diffusion(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    monkeypatch.setenv("OSCILLINK_NATIVE_DIFFUSION", "1")
    monkeypatch.setenv("OSCILLINK_FEAT_DIFFUSION_GATES", "1")
    rng = np.random.default_rng(43)
    Y = rng.standard_normal((24, 8)).astype(np.float32)
    psis = rng.standard_normal((2, 8)).astype(np.float32)
    p = {"Y": Y.tolist(), "psis": psis.tolist(), "bundle_k": 4,
         "diffusion": {"enable": True, "beta": 1.0, "gamma": 0.1}}
    r = client.post("/v1/settle/batch", json_body=p)
    assert r.status_code == 200
    b = r.json()
    assert b["meta"]["backend"] == "native"
    assert b["meta"]["diffusion"] == {"beta": 1.0, "gamma": 0.1}
    assert len(b["bundles"]) == 2


def test_bundle_cache_hit_skips_native_settle(client, monkeypatch):
    """A bundle-cache HIT on the native branch must not re-run the settle:
    the state_sig needed for the lookup comes from native_prepare alone."""
    from oscillink_tpu.service import native_path

    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "64")
    p = {**_payload(n=32, d=10, seed=31), "bundle_k": 5, "alpha": 0.6}
    r1 = client.post("/v1/bundle", json_body=p)
    assert r1.json()["meta"]["cache"] == "MISS"

    calls = []
    orig = native_path.native_settle

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(native_path, "native_settle", spy)
    r2 = client.post("/v1/bundle", json_body=p)
    assert r2.json()["meta"]["cache"] == "HIT"
    assert calls == []  # settle never ran on the HIT
    assert r2.json()["bundle"] == r1.json()["bundle"]
