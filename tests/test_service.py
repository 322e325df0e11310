"""In-process service integration tests (reference test strategy: SURVEY.md §4.2
— real app, env monkeypatching, no external services)."""

import time

import numpy as np
import pytest

from oscillink_tpu.service import LocalClient
from oscillink_tpu.service.api import create_state


def _payload(n=24, d=8, seed=0, **opts):
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
        "OSCILLINK_ADMIN_SECRET",
        "OSCILLINK_RECEIPT_SECRET",
    ):
        monkeypatch.delenv(var, raising=False)
    return LocalClient()


def test_health(client):
    r = client.get("/health")
    assert r.status_code == 200
    assert r.json()["status"] == "ok"


def test_settle_open_access(client):
    r = client.post("/v1/settle", json_body=_payload())
    assert r.status_code == 200
    body = r.json()
    assert body["state_sig"]
    assert body["receipt"]["deltaH_total"] is not None
    assert body["meta"]["N"] == 24
    assert "X-Request-ID" in r.headers


def test_settle_with_bundle(client):
    r = client.post("/v1/settle", json_body={**_payload(), "options": {"bundle_k": 4}})
    assert r.status_code == 200
    assert len(r.json()["bundle"]) == 4


def test_receipt_endpoint(client):
    r = client.post("/v1/receipt", json_body=_payload(seed=1))
    assert r.status_code == 200
    assert r.json()["receipt"] is not None


def test_bundle_cache_hit(client):
    p = {**_payload(seed=2), "bundle_k": 3}
    r1 = client.post("/v1/bundle", json_body=p)
    assert r1.status_code == 200
    assert r1.headers["X-Cache"] == "MISS"
    r2 = client.post("/v1/bundle", json_body=p)
    assert r2.headers["X-Cache"] == "HIT"
    assert r2.json()["bundle"] == r1.json()["bundle"]


def test_bundle_rerank_mode_distinct_cache(client):
    p = {**_payload(seed=2), "bundle_k": 3}
    r_mmr = client.post("/v1/bundle", json_body=p)
    assert r_mmr.status_code == 200
    # rerank mode must not serve the MMR cache entry (or vice versa)
    r_rr = client.post("/v1/bundle", json_body={**p, "diversify": False})
    assert r_rr.status_code == 200
    assert r_rr.headers["X-Cache"] == "MISS"
    scores = [e["score"] for e in r_rr.json()["bundle"]]
    assert scores == sorted(scores, reverse=True)
    r_rr2 = client.post("/v1/bundle", json_body={**p, "diversify": False})
    assert r_rr2.headers["X-Cache"] == "HIT"
    assert r_rr2.json()["bundle"] == r_rr.json()["bundle"]


def test_bundle_cache_keyed_on_alpha_and_k(client):
    """alpha and bundle_k change the served picks without changing the
    lattice state — each combination must cache separately (review finding:
    an alpha=1.0 request was served the cached alpha=0.0 ranking)."""
    p = {**_payload(seed=9), "bundle_k": 5, "alpha": 0.0}
    r_a0 = client.post("/v1/bundle", json_body=p)
    assert r_a0.headers["X-Cache"] == "MISS"
    r_a1 = client.post("/v1/bundle", json_body={**p, "alpha": 1.0})
    assert r_a1.headers["X-Cache"] == "MISS"
    r_k9 = client.post("/v1/bundle", json_body={**p, "bundle_k": 9})
    assert r_k9.headers["X-Cache"] == "MISS"
    assert len(r_k9.json()["bundle"]) == 9 and len(r_a0.json()["bundle"]) == 5
    assert client.post("/v1/bundle", json_body=p).headers["X-Cache"] == "HIT"


def test_chain_receipt_endpoint(client):
    p = {**_payload(seed=3), "chain": [0, 1, 2, 3]}
    r = client.post("/v1/chain/receipt", json_body=p)
    assert r.status_code == 200
    body = r.json()
    assert "verdict" in body["chain_receipt"]
    assert len(body["chain_receipt"]["edges"]) == 3


def test_auth_env_keys(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_API_KEYS", "k1,k2")
    r = client.post("/v1/settle", json_body=_payload())
    assert r.status_code == 401
    r2 = client.post("/v1/settle", json_body=_payload(), headers={"X-API-Key": "k1"})
    assert r2.status_code == 200


def test_shape_caps(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_MAX_NODES", "10")
    from oscillink_tpu.service import config

    config.get_settings.cache_clear()
    r = client.post("/v1/settle", json_body=_payload(n=24))
    config.get_settings.cache_clear()
    assert r.status_code == 413


def test_quota_window(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_API_KEYS", "qk")
    monkeypatch.setenv("OSCILLINK_KEY_NODE_UNITS_LIMIT", "400")
    monkeypatch.setenv("OSCILLINK_KEY_NODE_UNITS_WINDOW", "3600")
    # 24*8 = 192 units per request: 2 fit, 3rd exceeds
    h = {"X-API-Key": "qk"}
    assert client.post("/v1/settle", json_body=_payload(), headers=h).status_code == 200
    r2 = client.post("/v1/settle", json_body=_payload(), headers=h)
    assert r2.status_code == 200
    assert r2.headers["X-Quota-Remaining"] == "16"
    r3 = client.post("/v1/settle", json_body=_payload(), headers=h)
    assert r3.status_code == 429
    assert "Retry-After" in r3.headers


def test_monthly_cap(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_API_KEYS", "mk")
    monkeypatch.setenv("OSCILLINK_MONTHLY_CAP", "300")
    h = {"X-API-Key": "mk"}
    r1 = client.post("/v1/settle", json_body=_payload(), headers=h)
    assert r1.status_code == 200
    assert r1.headers["X-Monthly-Remaining"] == "108"
    r2 = client.post("/v1/settle", json_body=_payload(), headers=h)
    assert r2.status_code == 429


def test_global_rate_limit(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_RATE_LIMIT", "2")
    monkeypatch.setenv("OSCILLINK_RATE_WINDOW", "60")
    assert client.get("/health").status_code == 200
    assert client.get("/health").status_code == 200
    assert client.get("/health").status_code == 429


def test_per_ip_rate_limit(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_IP_RATE_LIMIT", "1")
    assert client.get("/health", remote_ip="1.2.3.4").status_code == 200
    assert client.get("/health", remote_ip="1.2.3.4").status_code == 429
    assert client.get("/health", remote_ip="5.6.7.8").status_code == 200


def test_diffusion_tier_gate(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_API_KEYS", "fk")
    monkeypatch.setenv("OSCILLINK_KEY_TIERS", "fk:free")
    gates = [1.0] * 24
    p = {**_payload(), "gates": gates}
    r = client.post("/v1/settle", json_body=p, headers={"X-API-Key": "fk"})
    assert r.status_code == 403
    monkeypatch.setenv("OSCILLINK_KEY_TIERS", "fk:pro")
    r2 = client.post("/v1/settle", json_body=p, headers={"X-API-Key": "fk"})
    assert r2.status_code == 200


def test_diffusion_killswitch(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_API_KEYS", "pk")
    monkeypatch.setenv("OSCILLINK_KEY_TIERS", "pk:pro")
    monkeypatch.setenv("OSCILLINK_DIFFUSION_GATES_ENABLED", "0")
    p = {**_payload(), "gates": [1.0] * 24}
    r = client.post("/v1/settle", json_body=p, headers={"X-API-Key": "pk"})
    assert r.status_code == 403


def test_jobs_roundtrip(client):
    r = client.post("/v1/jobs/settle", json_body=_payload(seed=4))
    assert r.status_code == 202
    job_id = r.json()["job_id"]
    deadline = time.time() + 30
    status = None
    while time.time() < deadline:
        jr = client.get(f"/v1/jobs/{job_id}")
        assert jr.status_code == 200
        status = jr.json()["status"]
        if status in ("done", "error"):
            break
        time.sleep(0.05)
    assert status == "done"
    assert jr.json()["result"]["receipt"]["deltaH_total"] is not None


def test_jobs_delete_unknown(client):
    assert client.delete("/v1/jobs/doesnotexist").status_code == 404


def test_autocorrect_endpoint(client):
    r = client.post("/v1/autocorrect", json_body={"text": "teh lattice"})
    assert r.status_code == 200
    assert r.json()["text"] == "the lattice"
    assert r.json()["changed"] is True


def test_bench_competitor(client):
    texts = [
        "paris is the capital of france",
        "london is the capital of england",
        "the moon is made of cheese",
        "berlin is the capital of germany",
        "rome is the capital of italy",
    ]
    r = client.post(
        "/v1/bench/competitor",
        json_body={
            "texts": texts,
            "query": "what is the capital of france",
            "labels": [1, 0, 0, 0, 0],
            "traps": [2],
            "k": 2,
            "kneighbors": 3,
        },
    )
    assert r.status_code == 200
    body = r.json()
    assert "cosine" in body and "oscillink" in body
    assert body["cosine"]["f1"] is not None


def test_stripe_webhook_unverified_and_idempotent(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_ALLOW_UNVERIFIED_STRIPE", "1")
    evt = {
        "id": "evt_123",
        "type": "checkout.session.completed",
        "data": {"object": {"id": "cs_1", "metadata": {"tier": "pro"}}},
    }
    r1 = client.post("/stripe/webhook", json_body=evt)
    assert r1.status_code == 200
    assert r1.json()["action"] == "provisioned"
    key = r1.json()["api_key"]
    assert client.state.keystore.get(key).tier == "pro"
    r2 = client.post("/stripe/webhook", json_body=evt)
    assert r2.json()["status"] == "duplicate"


def test_billing_success_shows_provisioned_key(client, monkeypatch):
    """Payment Link onboarding: /billing/success?session_id=... renders the
    key the checkout webhook provisioned (reference DEPLOY_STRIPE_CLOUD flow)."""
    monkeypatch.setenv("OSCILLINK_ALLOW_UNVERIFIED_STRIPE", "1")
    # redirect beats webhook: page must say "provisioning", not fail
    early = client.get("/billing/success", query={"session_id": "cs_pl_1"})
    assert early.status_code == 200
    assert "provisioned" in early.text
    evt = {
        "id": "evt_pl_1",
        "type": "checkout.session.completed",
        "data": {"object": {"id": "cs_pl_1", "metadata": {"tier": "beta"}}},
    }
    key = client.post("/stripe/webhook", json_body=evt).json()["api_key"]
    page = client.get("/billing/success", query={"session_id": "cs_pl_1"})
    assert page.status_code == 200
    assert key in page.text and "beta" in page.text
    # no session id: static CLI confirmation, never someone else's key
    plain = client.get("/billing/success")
    assert key not in plain.text


def test_billing_success_pending_enterprise(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_ALLOW_UNVERIFIED_STRIPE", "1")
    evt = {
        "id": "evt_pl_2",
        "type": "checkout.session.completed",
        "data": {"object": {"id": "cs_pl_2", "metadata": {"tier": "enterprise"}}},
    }
    client.post("/stripe/webhook", json_body=evt)
    page = client.get("/billing/success", query={"session_id": "cs_pl_2"})
    assert "pending" in page.text


def test_checkout_record_expires(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_ALLOW_UNVERIFIED_STRIPE", "1")
    evt = {
        "id": "evt_pl_3",
        "type": "checkout.session.completed",
        "data": {"object": {"id": "cs_pl_3", "metadata": {"tier": "free"}}},
    }
    client.post("/stripe/webhook", json_body=evt)
    rec = client.state.webhooks._checkouts["cs_pl_3"]
    rec["ts"] -= client.state.webhooks.CHECKOUT_TTL + 1
    assert client.state.webhooks.lookup_checkout("cs_pl_3") is None
    page = client.get("/billing/success", query={"session_id": "cs_pl_3"})
    assert "provisioned" in page.text  # expired -> neutral page, no key


def test_stripe_webhook_rejected_without_secret(client, monkeypatch):
    monkeypatch.delenv("OSCILLINK_ALLOW_UNVERIFIED_STRIPE", raising=False)
    monkeypatch.delenv("OSCILLINK_STRIPE_WEBHOOK_SECRET", raising=False)
    r = client.post("/stripe/webhook", json_body={"id": "evt_x", "type": "noop"})
    assert r.status_code == 503


def test_cli_pairing_flow(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_ALLOW_UNVERIFIED_STRIPE", "1")
    r = client.post("/billing/cli/start", json_body={})
    code = r.json()["code"]
    assert client.get(f"/billing/cli/poll/{code}").json()["status"] == "pending"
    # simulate checkout completion via webhook carrying the session id
    client.state.cli_sessions._sessions[code]["metadata"]["checkout_session_id"] = "cs_99"
    evt = {
        "id": "evt_cli",
        "type": "checkout.session.completed",
        "data": {"object": {"id": "cs_99", "metadata": {"tier": "beta"}}},
    }
    client.post("/stripe/webhook", json_body=evt)
    poll = client.get(f"/billing/cli/poll/{code}").json()
    assert poll["status"] == "complete"
    assert poll["api_key"]


def test_admin_endpoints(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_ADMIN_SECRET", "adm")
    h = {"X-Admin-Secret": "adm"}
    r = client.put(
        "/admin/keys/kx", json_body={"tier": "pro", "status": "active"}, headers=h
    )
    assert r.status_code == 200
    assert r.json()["tier"] == "pro"
    assert client.get("/admin/keys/kx", headers=h).status_code == 200
    assert client.get("/admin/keys/kx").status_code == 403  # no secret
    assert client.get("/admin/billing/price-map", headers=h).json()["tiers"]["free"][
        "monthly_unit_cap"
    ] == 5_000_000
    intro = client.get("/admin/introspect", headers=h, query={"api_key": "kx"})
    assert intro.json()["tier"] == "pro"
    # cache occupancy is reported (counts only), incl. the device-memory-
    # pinning graph cache with its global bound
    caches = intro.json()["caches"]
    assert caches["graph"]["enabled"] is False  # off by default
    assert caches["graph"]["entries"] == 0
    for c in ("graph", "bundle", "replay"):
        assert set(caches[c]) >= {"ttl_s", "entries", "buckets"}


def test_pending_key_403(client, monkeypatch):
    client.state.keystore.update("pend", create=True, status="pending")
    r = client.post("/v1/settle", json_body=_payload(), headers={"X-API-Key": "pend"})
    assert r.status_code == 403


def test_license_status_unknown(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_ENTITLEMENTS_PATH", "/nonexistent/ent.json")
    assert client.get("/license/status").json()["status"] == "unknown"
    monkeypatch.setenv("OSCILLINK_LICENSE_REQUIRED", "1")
    assert client.get("/license/status").status_code == 503


def test_license_status_ok(client, monkeypatch, tmp_path):
    import json as _json

    ent = tmp_path / "ent.json"
    ent.write_text(
        _json.dumps({"iss": "osc", "sub": "lic1", "tier": "pro", "exp": time.time() + 3600})
    )
    monkeypatch.setenv("OSCILLINK_ENTITLEMENTS_PATH", str(ent))
    body = client.get("/license/status").json()
    assert body["status"] == "ok" and body["tier"] == "pro"


def test_usage_log_written(client, monkeypatch, tmp_path):
    import json as _json

    log = tmp_path / "usage.jsonl"
    monkeypatch.setenv("OSCILLINK_USAGE_LOG", str(log))
    monkeypatch.setenv("OSCILLINK_USAGE_SIGNING_SECRET", "sek")
    client.post("/v1/settle", json_body=_payload(seed=5))
    lines = log.read_text().strip().splitlines()
    assert len(lines) == 1
    rec = _json.loads(lines[0])
    assert rec["event"] == "settle" and "sig" in rec


def test_validation_errors(client):
    assert client.post("/v1/settle", json_body={"Y": []}).status_code in (400, 422)
    assert client.post("/v1/settle", json_body={"nope": 1}).status_code == 422
    bad_psi = {**_payload(), "psi": [1.0, 2.0]}
    assert client.post("/v1/settle", json_body=bad_psi).status_code == 400
    r = client.request("POST", "/v1/settle", data=b"{not json")
    assert r.status_code == 400


def test_unknown_route_404(client):
    assert client.get("/v1/doesnotexist").status_code == 404


def test_settle_batch_endpoint(client):
    rng = np.random.default_rng(11)
    Y = rng.standard_normal((24, 8)).astype(np.float32)
    psis = rng.standard_normal((3, 8)).astype(np.float32)
    r = client.post(
        "/v1/settle/batch",
        json_body={"Y": Y.tolist(), "psis": psis.tolist(), "bundle_k": 4},
    )
    assert r.status_code == 200
    body = r.json()
    assert body["queries"] == 3
    assert len(body["bundles"]) == 3 and len(body["bundles"][0]) == 4
    # batch result matches a single-query settle bundle
    single = client.post(
        "/v1/settle",
        json_body={
            "Y": Y.tolist(),
            "psi": psis[0].tolist(),
            "options": {"bundle_k": 4, "include_receipt": False},
        },
    ).json()
    assert [e["id"] for e in body["bundles"][0]] == [e["id"] for e in single["bundle"]]


def test_adaptive_profiles_through_service(client, monkeypatch):
    monkeypatch.setenv("OSCILLINK_API_KEYS", "ak")
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_PROFILES", "1")
    h = {"X-API-Key": "ak"}
    r = client.post("/v1/settle", json_body=_payload(), headers=h)
    assert r.status_code == 200
    assert r.json()["meta"]["profile_id"] == "baseline"
    # learned profile applied and clipped
    client.state.learners.store.set(
        "ak", {"active_profile_id": "p-x", "learned_params": {"lamQ": 99.0}}
    )
    r2 = client.post("/v1/settle", json_body=_payload(), headers=h)
    assert r2.json()["meta"]["profile_id"] == "p-x"
    assert r2.json()["meta"]["lam"]["Q"] == 8.0  # clipped to the bound
    assert r2.headers["X-Profile-Id"] == "p-x"
    # exploration surfaces as the 'explore' profile
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_LEARN", "1")
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_EPS", "1.0")
    r3 = client.post("/v1/settle", json_body=_payload(), headers=h)
    assert r3.json()["meta"]["profile_id"] == "explore"
    # observations recorded
    doc = client.state.learners.store.get("ak")
    assert doc and doc["obs_count"] >= 1


def test_settle_batch_validation(client):
    rng = np.random.default_rng(12)
    Y = rng.standard_normal((10, 4)).astype(np.float32)
    assert (
        client.post(
            "/v1/settle/batch", json_body={"Y": Y.tolist(), "psis": [[1.0, 2.0]]}
        ).status_code
        == 400
    )
    assert (
        client.post("/v1/settle/batch", json_body={"Y": Y.tolist(), "psis": []}).status_code
        == 400
    )
