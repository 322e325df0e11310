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
