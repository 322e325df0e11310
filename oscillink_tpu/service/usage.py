"""Usage JSONL log with optional per-line HMAC signing
(reference cloud/app/services/usage_log.py:10-33)."""

from __future__ import annotations

import hashlib
import hmac
import json
import os
from typing import Any, Optional


def _signing_secret() -> Optional[bytes]:
    s = os.getenv("OSCILLINK_USAGE_SIGNING_SECRET")
    return s.encode("utf-8") if s else None


def append_usage(record: dict[str, Any]) -> None:
    """Append one JSONL usage record to OSCILLINK_USAGE_LOG (no-op when unset).

    With OSCILLINK_USAGE_SIGNING_SECRET set, each line carries an HMAC-SHA256
    'sig' over its canonical JSON (for the remote flusher to verify)."""
    path = os.getenv("OSCILLINK_USAGE_LOG")
    if not path:
        return
    try:
        secret = _signing_secret()
        if secret is not None:
            raw = json.dumps(record, sort_keys=True).encode("utf-8")
            record = {**record, "sig": hmac.new(secret, raw, hashlib.sha256).hexdigest()}
        with open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record, separators=(",", ":")) + "\n")
    except Exception:
        pass  # usage logging must never break the request path
