"""Deploy artifact smoke tests: Cloud Build recipes, the licensed image
recipe, and the entrypoint's licensed-mode flow (reference counterparts:
cloud/cloudbuild.yaml, cloud/cloudbuild.kaniko.yaml, cloud/Dockerfile.licensed,
cloud/entrypoint.sh)."""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEPLOY = os.path.join(REPO, "deploy")


def _load_yaml(path: str) -> dict:
    try:
        import yaml  # type: ignore

        with open(path, encoding="utf-8") as f:
            return yaml.safe_load(f)
    except ImportError:  # minimal structural parse: keys we assert on
        with open(path, encoding="utf-8") as f:
            text = f.read()
        return {"_raw": text}


def test_cloudbuild_recipes_exist_and_reference_real_dockerfiles():
    for name in ("cloudbuild.yaml", "cloudbuild.kaniko.yaml"):
        path = os.path.join(DEPLOY, name)
        assert os.path.exists(path), name
        doc = _load_yaml(path)
        raw = doc.get("_raw") or json.dumps(doc)
        assert "steps" in raw
        # every --dockerfile / -f target must exist in the repo
        for m in re.findall(r"(?:--dockerfile=|-f', ')([\w./]+)", raw):
            assert os.path.exists(os.path.join(REPO, m)), m
    # docker variant defaults to the unlicensed Dockerfile and documents the
    # licensed substitution
    with open(os.path.join(DEPLOY, "cloudbuild.yaml"), encoding="utf-8") as f:
        text = f.read()
    assert "deploy/Dockerfile" in text
    assert "Dockerfile.licensed" in text


def test_licensed_dockerfile_copy_sources_exist():
    path = os.path.join(DEPLOY, "Dockerfile.licensed")
    assert os.path.exists(path)
    with open(path, encoding="utf-8") as f:
        text = f.read()
    # licensed mode must be baked in, pointing at the entrypoint that
    # enforces it (deploy/entrypoint.sh:6-17)
    assert "OSCILLINK_LICENSE_REQUIRED=1" in text
    assert "/entrypoint.sh" in text
    for m in re.findall(r"^COPY\s+([\w./]+)", text, flags=re.M):
        assert os.path.exists(os.path.join(REPO, m)), m


def test_entrypoint_refuses_licensed_mode_without_config(tmp_path):
    """OSCILLINK_LICENSE_REQUIRED=1 with no license file/JWKS URL must fail
    fast (exit 1) BEFORE any server starts — the reference's entrypoint
    contract (cloud/entrypoint.sh:7-17)."""
    env = {
        "PATH": os.environ.get("PATH", ""),
        "OSCILLINK_LICENSE_REQUIRED": "1",
    }
    proc = subprocess.run(
        ["sh", os.path.join(DEPLOY, "entrypoint.sh")],
        env=env,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 1
    assert "OSCILLINK_LICENSE_FILE" in proc.stderr


def test_entrypoint_license_verification_step_roundtrip(tmp_path):
    """The exact command the entrypoint runs in licensed mode
    (deploy/entrypoint.sh:11-15) succeeds offline against a file:// JWKS
    and exports sourceable entitlement env lines."""
    pytest.importorskip("cryptography")
    from oscillink_tpu.tools.license_service import LicenseIssuer

    iss = LicenseIssuer(issuer="oscillink-license")
    token = iss.issue(
        sub="acct_smoke",
        tier="pro",
        features={"diffusion_gates": True},
        limits={"max_nodes": 9000},
        ttl=3600,
    )
    # the verifier's JWKS cache is keyed by path, not URL (offline-grace
    # semantics); clear the default path so a prior run's key can't be served
    try:
        os.unlink("/tmp/oscillink_jwks_cache.json")
    except FileNotFoundError:
        pass
    lic = tmp_path / "oscillink.lic"
    lic.write_text(token)
    jwks = tmp_path / "jwks.json"
    jwks.write_text(json.dumps(iss.jwks()))
    ent = tmp_path / "entitlements.json"
    env_out = tmp_path / "env.sh"

    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "oscillink_tpu.tools.license",
            "--license-file",
            str(lic),
            "--jwks-url",
            jwks.as_uri(),
            "--out",
            str(ent),
            "--env-out",
            str(env_out),
        ],
        env=dict(os.environ),
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr
    data = json.loads(ent.read_text())
    assert data["tier"] == "pro"
    lines = env_out.read_text()
    assert "OSCILLINK_MAX_NODES=9000" in lines
    # the entrypoint sources this file: it must be valid sh
    check = subprocess.run(
        ["sh", "-c", f". {env_out} && echo $OSCILLINK_MAX_NODES"],
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert check.stdout.strip() == "9000"
