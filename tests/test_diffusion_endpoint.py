"""Server-side diffusion block on the compute endpoints.

The reference proposed (but never shipped) a diffusion-settle endpoint
(docs/cloud/CLOUD_ADVANCED_DIFFUSION_ENDPOINT.md); here the `diffusion`
request block derives gates over the lattice's own graph before the settle
(service/models.py:DiffusionOptions, api.py:_build_lattice)."""

import numpy as np
import pytest

from oscillink_tpu.service import LocalClient


def _clustered_payload(n=30, d=16, seed=3, **opts):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    Y[: n // 2] += 2.5 * np.ones(d, dtype=np.float32)  # topical cluster
    psi = Y[: n // 2].mean(axis=0)
    psi /= np.linalg.norm(psi) + 1e-12
    return {
        "Y": Y.tolist(),
        "psi": psi.astype(np.float32).tolist(),
        "options": {"max_iters": 8, "tol": 1e-3, **opts},
    }


@pytest.fixture()
def client(monkeypatch):
    for var in (
        "OSCILLINK_API_KEYS",
        "OSCILLINK_KEY_TIERS",
        "OSCILLINK_MONTHLY_CAP",
        "OSCILLINK_RATE_LIMIT",
        "OSCILLINK_IP_RATE_LIMIT",
    ):
        monkeypatch.delenv(var, raising=False)
    # open access resolves the free tier; enable the feature via the env
    # overlay so the compute paths (not the gate) are under test here —
    # tier gating itself is covered by test_diffusion_block_tier_gated
    monkeypatch.setenv("OSCILLINK_FEAT_DIFFUSION_GATES", "1")
    return LocalClient()


def test_diffusion_block_applies_gates(client):
    base = _clustered_payload()
    r_plain = client.post("/v1/settle", json_body=base)
    r_diff = client.post(
        "/v1/settle",
        json_body={**base, "diffusion": {"beta": 1.0, "gamma": 0.1}},
    )
    assert r_plain.status_code == 200 and r_diff.status_code == 200
    plain, diff = r_plain.json(), r_diff.json()
    # gates actually moved: meta echo present, receipt stats non-uniform,
    # and the state signature (which hashes B_diag) differs
    assert diff["meta"]["diffusion"] == {"beta": 1.0, "gamma": 0.1}
    assert plain["meta"]["diffusion"] is None
    m = diff["receipt"]["meta"]
    assert m["gates_min"] < m["gates_max"]
    assert diff["state_sig"] != plain["state_sig"]
    # gates concentrate on the topical cluster psi points at
    assert m["gates_mean"] < 1.0


def test_diffusion_block_matches_sdk(client):
    from oscillink_tpu import OscillinkLattice

    base = _clustered_payload(seed=11)
    r = client.post(
        "/v1/settle", json_body={**base, "diffusion": {"beta": 1.0, "gamma": 0.1}}
    )
    assert r.status_code == 200

    Y = np.array(base["Y"], dtype=np.float32)
    lat = OscillinkLattice(Y, kneighbors=6)
    lat.set_query(np.array(base["psi"], dtype=np.float32))
    lat.diffusion_gates(beta=1.0, gamma=0.1, apply=True)
    lat.settle(dt=1.0, max_iters=8, tol=1e-3)
    rec = lat.receipt()
    assert r.json()["state_sig"] == rec["meta"]["state_sig"]
    np.testing.assert_allclose(
        r.json()["receipt"]["deltaH_total"], rec["deltaH_total"], rtol=1e-5
    )


def test_diffusion_block_tier_gated(client, monkeypatch):
    monkeypatch.delenv("OSCILLINK_FEAT_DIFFUSION_GATES", raising=False)
    monkeypatch.setenv("OSCILLINK_API_KEYS", "fk")
    monkeypatch.setenv("OSCILLINK_KEY_TIERS", "fk:free")
    p = {**_clustered_payload(), "diffusion": {"beta": 1.0, "gamma": 0.1}}
    r = client.post("/v1/settle", json_body=p, headers={"X-API-Key": "fk"})
    assert r.status_code == 403
    monkeypatch.setenv("OSCILLINK_KEY_TIERS", "fk:pro")
    assert (
        client.post("/v1/settle", json_body=p, headers={"X-API-Key": "fk"}).status_code
        == 200
    )
    # disabled block does not trip the gate
    monkeypatch.setenv("OSCILLINK_KEY_TIERS", "fk:free")
    p_off = {**_clustered_payload(), "diffusion": {"enable": False}}
    assert (
        client.post(
            "/v1/settle", json_body=p_off, headers={"X-API-Key": "fk"}
        ).status_code
        == 200
    )


def test_diffusion_block_validation(client):
    p = {**_clustered_payload(), "diffusion": {"gamma": 0.0}}
    assert client.post("/v1/settle", json_body=p).status_code == 422
    p2 = {
        **_clustered_payload(),
        "gates": [1.0] * 30,
        "diffusion": {"gamma": 0.1},
    }
    assert client.post("/v1/settle", json_body=p2).status_code == 422
    # degenerate solver knobs are rejected, not served (review finding:
    # max_iters=0 used to 200 with gates = the normalized initial guess)
    for bad in (
        {"max_iters": 0},
        {"max_iters": 1 << 20},
        {"tol": 0.0},
        {"tol": float("nan")},
        {"beta": float("inf")},
    ):
        p3 = {**_clustered_payload(), "diffusion": {"gamma": 0.1, **bad}}
        assert client.post("/v1/settle", json_body=p3).status_code == 422, bad


def test_diffusion_rejected_before_quota_charge(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_API_KEYS", "qk")
    monkeypatch.setenv("OSCILLINK_KEY_TIERS", "qk:pro")
    monkeypatch.setenv("OSCILLINK_KEY_NODE_UNITS_LIMIT", "2000")
    hdr = {"X-API-Key": "qk"}
    bad = {**_clustered_payload(n=30, d=16), "diffusion": {"gamma": 0.0}}
    for _ in range(3):  # would exhaust a 2000-unit window if charged
        assert client.post("/v1/settle", json_body=bad, headers=hdr).status_code == 422
    ok = _clustered_payload(n=30, d=16)
    r = client.post("/v1/settle", json_body=ok, headers=hdr)
    assert r.status_code == 200
    # full window minus this request's N*D=480: nothing was charged for 422s
    assert int(r.headers["X-Quota-Remaining"]) == 2000 - 480


def test_diffusion_gate_applies_to_jobs(client, monkeypatch):
    monkeypatch.delenv("OSCILLINK_FEAT_DIFFUSION_GATES", raising=False)
    monkeypatch.setenv("OSCILLINK_API_KEYS", "jk")
    monkeypatch.setenv("OSCILLINK_KEY_TIERS", "jk:free")
    p = {**_clustered_payload(), "diffusion": {"beta": 1.0, "gamma": 0.1}}
    r = client.post("/v1/jobs/settle", json_body=p, headers={"X-API-Key": "jk"})
    assert r.status_code == 403  # jobs are not a diffusion tier-gate bypass
    bad = {**_clustered_payload(), "diffusion": {"gamma": 0.0}}
    monkeypatch.setenv("OSCILLINK_KEY_TIERS", "jk:pro")
    r2 = client.post("/v1/jobs/settle", json_body=bad, headers={"X-API-Key": "jk"})
    assert r2.status_code == 422  # rejected at submit, not at execution


def test_diffusion_on_batch_matches_single_settles(client):
    """The batch endpoint's diffusion block = Q vmapped screened-Poisson
    solves over the shared graph; per-query results must match the
    single-settle diffusion block."""
    base = _clustered_payload(n=30, d=16, seed=21)
    Y = base["Y"]
    rng = np.random.default_rng(3)
    psis = rng.standard_normal((3, 16)).astype(np.float32)
    psis /= np.linalg.norm(psis, axis=1, keepdims=True)
    diff = {"beta": 1.0, "gamma": 0.1}
    r = client.post(
        "/v1/settle/batch",
        json_body={
            "Y": Y,
            "psis": psis.tolist(),
            "bundle_k": 4,
            "diffusion": diff,
        },
    )
    assert r.status_code == 200
    body = r.json()
    assert body["meta"]["diffusion"] == diff
    for qi in range(3):
        rs = client.post(
            "/v1/settle",
            json_body={
                "Y": Y,
                "psi": psis[qi].tolist(),
                "diffusion": diff,
                "options": {"bundle_k": 4, "include_receipt": False},
            },
        )
        assert rs.status_code == 200
        assert [e["id"] for e in body["bundles"][qi]] == [
            e["id"] for e in rs.json()["bundle"]
        ]
    # mutual exclusion with explicit per-query gates
    r2 = client.post(
        "/v1/settle/batch",
        json_body={
            "Y": Y,
            "psis": psis.tolist(),
            "gates_batch": [[1.0] * 30] * 3,
            "diffusion": diff,
        },
    )
    assert r2.status_code == 422


def test_diffusion_on_ragged_is_explicit_422(client):
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((24, 8)).astype(np.float32)
    psi = rng.standard_normal(8).astype(np.float32)
    r2 = client.post(
        "/v1/bundle/ragged",
        json_body={
            "corpora": [Y.tolist()],
            "psis": [psi.tolist()],
            "diffusion": {"beta": 1.0, "gamma": 0.1},
        },
    )
    assert r2.status_code == 422
    assert "ragged" in r2.json()["detail"]


def test_diffusion_routing_native_optin_sharded_no(monkeypatch):
    """Diffusion requests route off BOTH fast tiers by default: off native
    because the engine's screened-Poisson CG agrees with the JAX
    derivation only to ~1e-4 and derived gates feed state_sig (replica-
    dependent signatures would split signed receipts / the bundle cache);
    off sharded because gates are derived on the single-device lattice
    graph there.  OSCILLINK_NATIVE_DIFFUSION=1 opts single-backend
    deployments back into the native tier."""
    from oscillink_tpu.service.models import DiffusionOptions, SettleRequest
    from oscillink_tpu.service import native_path, sharded_path
    from oscillink_tpu.native import native_available

    sreq = SettleRequest(
        Y=[[0.0, 1.0], [1.0, 0.0], [0.5, 0.5]],
        diffusion=DiffusionOptions(),
    )
    monkeypatch.setenv("OSCILLINK_NATIVE_SMALL_N", "2048")
    monkeypatch.setenv("OSCILLINK_SHARDED_MIN_N", "2")
    assert native_path.eligible(sreq, 3) is False
    monkeypatch.setenv("OSCILLINK_NATIVE_DIFFUSION", "1")
    assert native_path.eligible(sreq, 3) is native_available()
    monkeypatch.delenv("OSCILLINK_NATIVE_DIFFUSION")
    assert sharded_path.eligible(sreq, 3) is False
    sreq_off = SettleRequest(
        Y=sreq.Y, diffusion=DiffusionOptions(enable=False)
    )
    assert sharded_path.eligible(sreq_off, 3) is True


def test_diffusion_block_on_bundle_changes_cache_key(client):
    base = _clustered_payload(seed=7)
    p_plain = {**base, "bundle_k": 4}
    p_diff = {**base, "bundle_k": 4, "diffusion": {"beta": 1.0, "gamma": 0.1}}
    r1 = client.post("/v1/bundle", json_body=p_plain)
    r2 = client.post("/v1/bundle", json_body=p_diff)
    assert r1.status_code == 200 and r2.status_code == 200
    assert r1.json()["state_sig"] != r2.json()["state_sig"]
    # diffusion request caches under its own key
    r3 = client.post("/v1/bundle", json_body=p_diff)
    assert r3.json()["meta"]["cache"] == "HIT"
    assert r3.json()["state_sig"] == r2.json()["state_sig"]
