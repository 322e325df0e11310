"""CLI commands (stubbed HTTP) + license tooling + usage flusher."""

import json

import numpy as np
import pytest

from oscillink_tpu import cli
from oscillink_tpu.tools.license import (
    LicenseError,
    entitlement_env_lines,
    verify_license_token,
)
from oscillink_tpu.tools.license_service import LicenseIssuer
from oscillink_tpu.tools.usage_flush import read_new_lines


@pytest.fixture()
def config_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("OSCILLINK_CONFIG_DIR", str(tmp_path / "cfg"))
    return tmp_path


def _stub_http(monkeypatch, responses):
    calls = []

    def fake_http(method, url, data=None, headers=None):
        calls.append((method, url, data, headers))
        for frag, resp in responses.items():
            if frag in url:
                return resp
        raise RuntimeError(f"unexpected url {url}")

    monkeypatch.setattr(cli, "_http", fake_http)
    return calls


def test_cli_login_and_whoami(config_dir, monkeypatch, capsys):
    _stub_http(
        monkeypatch,
        {"/billing/cli/poll/abc": {"status": "complete", "api_key": "key123", "tier": "pro"}},
    )
    assert cli.main(["login", "--code", "abc"]) == 0
    assert cli.main(["whoami"]) == 0
    out = capsys.readouterr().out
    assert "key123" in out
    assert cli.main(["logout"]) == 0
    assert cli.main(["whoami"]) == 1


def test_cli_login_pending(config_dir, monkeypatch):
    _stub_http(monkeypatch, {"/billing/cli/poll/p": {"status": "pending"}})
    assert cli.main(["login", "--code", "p"]) == 1


def test_cli_signup_no_wait(config_dir, monkeypatch, capsys):
    _stub_http(
        monkeypatch,
        {"/billing/cli/start": {"code": "xyz", "status": "pending", "checkout_url": "http://x"}},
    )
    assert cli.main(["signup"]) == 0
    assert "xyz" in capsys.readouterr().out


def test_cli_portal_requires_login(config_dir, monkeypatch):
    assert cli.main(["portal"]) == 1


def test_cli_settle_local(config_dir, tmp_path, capsys):
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((20, 8)).astype(np.float32)
    psi = rng.standard_normal(8).astype(np.float32)
    p = tmp_path / "emb.npz"
    np.savez(p, Y=Y, psi=psi)
    assert cli.main(["settle", str(p), "--kneighbors", "3", "--light"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert "deltaH_total" in out and out["settle"]["iters"] >= 1


def test_cli_settle_diffusion_and_rerank(config_dir, tmp_path, capsys):
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((20, 8)).astype(np.float32)
    psi = rng.standard_normal(8).astype(np.float32)
    p = tmp_path / "emb.npz"
    np.savez(p, Y=Y, psi=psi)
    assert cli.main([
        "settle", str(p), "--kneighbors", "3", "--light",
        "--diffusion", "--bundle-k", "5", "--rerank",
    ]) == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["bundle"]) == 5 and len(set(out["bundle"])) == 5


def test_license_roundtrip():
    iss = LicenseIssuer()
    token = iss.issue(
        sub="lic-42",
        tier="enterprise",
        limits={"max_nodes": 10000, "quota_units": 1000, "monthly_cap": 99},
        features={"diffusion_gates": True, "priority_queue": False},
    )
    payload = verify_license_token(token, jwks=iss.jwks(), iss="oscillink-license")
    assert payload["tier"] == "enterprise"
    lines = entitlement_env_lines(payload)
    assert "OSCILLINK_MAX_NODES=10000" in lines
    assert "OSCILLINK_FEAT_DIFFUSION_GATES=1" in lines
    assert "OSCILLINK_FEAT_PRIORITY_QUEUE=0" in lines
    assert "OSCILLINK_MONTHLY_CAP=99" in lines
    assert "OSCILLINK_KEY_TIERS=lic-42:enterprise" in lines


def test_license_rejects_tamper_and_claims():
    iss = LicenseIssuer()
    token = iss.issue(sub="x", tier="pro")
    h, p, s = token.split(".")
    import base64

    payload = json.loads(base64.urlsafe_b64decode(p + "=="))
    payload["tier"] = "enterprise"
    p_bad = base64.urlsafe_b64encode(json.dumps(payload).encode()).rstrip(b"=").decode()
    with pytest.raises(LicenseError):
        verify_license_token(f"{h}.{p_bad}.{s}", jwks=iss.jwks())
    with pytest.raises(LicenseError):
        verify_license_token(token, jwks=iss.jwks(), iss="wrong-issuer")
    with pytest.raises(LicenseError):
        verify_license_token(token, jwks=iss.jwks(), aud="nobody")
    # expired token
    expired = iss.issue(sub="x", ttl=-10_000)
    with pytest.raises(LicenseError):
        verify_license_token(expired, jwks=iss.jwks())


def test_license_wrong_key_fails():
    iss_a, iss_b = LicenseIssuer(), LicenseIssuer()
    token = iss_a.issue(sub="x")
    with pytest.raises(LicenseError):
        verify_license_token(token, jwks=iss_b.jwks())


def test_usage_flush_offsets(tmp_path):
    log = tmp_path / "usage.jsonl"
    offset = str(log) + ".offset"
    log.write_text('{"a": 1}\n{"a": 2}\n')
    recs, new_off = read_new_lines(str(log), offset)
    assert [r["a"] for r in recs] == [1, 2]
    with open(offset, "w") as f:
        f.write(str(new_off))
    with open(log, "a") as f:
        f.write('{"a": 3}\n')
    recs2, _ = read_new_lines(str(log), offset)
    assert [r["a"] for r in recs2] == [3]
