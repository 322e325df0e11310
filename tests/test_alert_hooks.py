"""Cap-threshold alert webhooks (service/alerts.py) — the reference
checklist's 'Alert hooks' item: POST on monthly-usage threshold crossings,
once per (key, period, threshold), best-effort, optionally HMAC-signed."""

import hashlib
import hmac
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from oscillink_tpu.service.governance import MonthlyUsage
from oscillink_tpu.service.keystore import InMemoryKeyStore


class _Sink(BaseHTTPRequestHandler):
    received: list = []

    def do_POST(self):
        ln = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(ln)
        _Sink.received.append(
            (dict(self.headers), json.loads(body.decode()), body)
        )
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


@pytest.fixture()
def sink():
    _Sink.received = []
    srv = HTTPServer(("127.0.0.1", 0), _Sink)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _wait_for(n, timeout=5.0):
    t0 = time.time()
    while len(_Sink.received) < n and time.time() - t0 < timeout:
        time.sleep(0.02)
    return len(_Sink.received)


def test_threshold_alerts_fire_once_and_sign(sink, monkeypatch):
    monkeypatch.setenv(
        "OSCILLINK_ALERT_WEBHOOK_URL",
        f"http://127.0.0.1:{sink.server_address[1]}/alerts",
    )
    monkeypatch.setenv("OSCILLINK_ALERT_SECRET", "alert-secret")
    monkeypatch.setenv("OSCILLINK_MONTHLY_CAP", "1000")
    monkeypatch.setenv("OSCILLINK_API_KEYS", "key-alpha-12345")
    monkeypatch.delenv("OSCILLINK_MONTHLY_USAGE_COLLECTION", raising=False)
    monkeypatch.delenv("OSCILLINK_STATE_BACKEND", raising=False)

    ks = InMemoryKeyStore()
    m = MonthlyUsage()
    m.check_and_consume("key-alpha-12345", 500, ks)  # 50%: nothing
    assert _wait_for(0, timeout=0.3) == 0
    m.check_and_consume("key-alpha-12345", 350, ks)  # 85%: crosses 0.8
    assert _wait_for(1) == 1
    headers, payload, body = _Sink.received[0]
    assert payload["event"] == "monthly_cap_threshold"
    assert payload["threshold"] == 0.8
    assert payload["used"] == 850 and payload["limit"] == 1000
    assert payload["api_key_suffix"] == "key-alpha-12345"[-4:]
    assert "key-alpha-12345" not in body.decode()  # raw key never leaves the process
    assert payload["api_key_hash"] == hashlib.sha256(b"key-alpha-12345").hexdigest()[:12]
    sig = hmac.new(b"alert-secret", body, hashlib.sha256).hexdigest()
    assert headers.get("X-Oscillink-Signature") == sig

    m.check_and_consume("key-alpha-12345", 50, ks)  # 90%: 0.8 already fired — no dup
    assert _wait_for(1, timeout=0.4) == 1
    m.check_and_consume("key-alpha-12345", 100, ks)  # 100%: crosses 1.0
    assert _wait_for(2) == 2
    assert _Sink.received[1][1]["threshold"] == 1.0


def test_alerts_never_block_on_dead_sink(monkeypatch):
    monkeypatch.setenv("OSCILLINK_ALERT_WEBHOOK_URL", "http://127.0.0.1:1/x")
    monkeypatch.setenv("OSCILLINK_MONTHLY_CAP", "100")
    monkeypatch.setenv("OSCILLINK_API_KEYS", "kd")
    monkeypatch.delenv("OSCILLINK_MONTHLY_USAGE_COLLECTION", raising=False)
    monkeypatch.delenv("OSCILLINK_STATE_BACKEND", raising=False)
    ks = InMemoryKeyStore()
    m = MonthlyUsage()
    t0 = time.time()
    ctx = m.check_and_consume("kd", 90, ks)  # crosses 0.8 into a dead sink
    assert ctx["used"] == 90
    assert time.time() - t0 < 1.0  # fire-and-forget: request path unblocked


def test_alerts_off_without_url(monkeypatch):
    monkeypatch.delenv("OSCILLINK_ALERT_WEBHOOK_URL", raising=False)
    monkeypatch.setenv("OSCILLINK_MONTHLY_CAP", "100")
    monkeypatch.setenv("OSCILLINK_API_KEYS", "ko")
    monkeypatch.delenv("OSCILLINK_MONTHLY_USAGE_COLLECTION", raising=False)
    monkeypatch.delenv("OSCILLINK_STATE_BACKEND", raising=False)
    ks = InMemoryKeyStore()
    m = MonthlyUsage()
    assert m.check_and_consume("ko", 90, ks)["used"] == 90  # no error path


def test_signed_usage_records_endpoint(tmp_path, monkeypatch):
    """Reference checklist: 'Signed usage receipts endpoint + verification
    helper'. Records export per key with per-line HMACs that
    verify_usage_line and the ?verify=1 server-side check both accept."""
    from oscillink_tpu.service.testing import LocalClient
    from oscillink_tpu.service.usage import verify_usage_line

    log = tmp_path / "usage.jsonl"
    monkeypatch.setenv("OSCILLINK_USAGE_LOG", str(log))
    monkeypatch.setenv("OSCILLINK_USAGE_SIGNING_SECRET", "use-sec")
    monkeypatch.setenv("OSCILLINK_ADMIN_SECRET", "adm")
    monkeypatch.setenv("OSCILLINK_API_KEYS", "ku1,ku2")
    monkeypatch.delenv("OSCILLINK_RATE_LIMIT", raising=False)
    monkeypatch.delenv("OSCILLINK_IP_RATE_LIMIT", raising=False)
    monkeypatch.delenv("OSCILLINK_MONTHLY_CAP", raising=False)

    client = LocalClient()
    import numpy as np

    rng = np.random.default_rng(0)
    Y = rng.standard_normal((16, 8)).astype(np.float32)
    psi = (Y[0] / np.linalg.norm(Y[0])).astype(np.float32)
    body = {"Y": Y.tolist(), "psi": psi.tolist()}
    for key in ("ku1", "ku1", "ku2"):
        assert client.post("/v1/settle", json_body=body,
                           headers={"X-API-Key": key}).status_code == 200

    h = {"X-Admin-Secret": "adm"}
    r = client.request("GET", "/admin/usage/ku1/records", headers=h,
                       query={"verify": "1"})
    assert r.status_code == 200
    out = r.json()
    assert out["count"] == 2 and out["verified"] == 2 and out["unverified"] == 0
    assert all(rec["api_key"] == "ku1" for rec in out["records"])
    assert all(verify_usage_line(rec, "use-sec") for rec in out["records"])
    # tampering breaks the line signature
    bad = dict(out["records"][0])
    bad["units"] = 10**9
    assert not verify_usage_line(bad, "use-sec")
    assert not verify_usage_line(out["records"][0], "wrong")
    # the plain /admin/usage/{key} summary route still matches
    assert client.request("GET", "/admin/usage/ku1", headers=h).status_code == 200
    # verify without a configured secret is a clear 409
    monkeypatch.delenv("OSCILLINK_USAGE_SIGNING_SECRET")
    r = client.request("GET", "/admin/usage/ku1/records", headers=h,
                       query={"verify": "1"})
    assert r.status_code == 409


def test_cap_rejection_alert_fires(sink, monkeypatch):
    """Review fix: a key whose usage never lands exactly on the cap still
    alerts the operator when requests start being rejected."""
    monkeypatch.setenv(
        "OSCILLINK_ALERT_WEBHOOK_URL",
        f"http://127.0.0.1:{sink.server_address[1]}/alerts",
    )
    monkeypatch.setenv("OSCILLINK_ALERT_THRESHOLDS", "0.99")  # never crossed
    monkeypatch.setenv("OSCILLINK_MONTHLY_CAP", "1000")
    monkeypatch.setenv("OSCILLINK_API_KEYS", "key-reject-99")
    monkeypatch.delenv("OSCILLINK_MONTHLY_USAGE_COLLECTION", raising=False)
    monkeypatch.delenv("OSCILLINK_STATE_BACKEND", raising=False)
    ks = InMemoryKeyStore()
    m = MonthlyUsage()
    m.check_and_consume("key-reject-99", 768, ks)  # 76.8%
    with pytest.raises(Exception):
        m.check_and_consume("key-reject-99", 384, ks)  # rejected at 76.8%
    assert _wait_for(1) == 1
    payload = _Sink.received[0][1]
    assert payload["event"] == "monthly_cap_rejected"
    assert payload["used"] == 768 and payload["limit"] == 1000
    # once per key/period: a second rejection stays quiet
    with pytest.raises(Exception):
        m.check_and_consume("key-reject-99", 384, ks)
    assert _wait_for(1, timeout=0.4) == 1
