"""CLI pairing sessions: signup code -> session store with TTL
(reference cloud/app/services/cli.py:11-153).  In-memory backend; a Redis
backend slots in via the same interface when OSCILLINK_STATE_BACKEND=redis
and a client is reachable.
"""

from __future__ import annotations

import os
import secrets
import time
from typing import Dict, Optional


def _ttl() -> float:
    try:
        return float(os.getenv("OSCILLINK_CLI_SESSION_TTL", "900"))
    except ValueError:
        return 900.0


class CliSessionStore:
    def __init__(self) -> None:
        self._sessions: Dict[str, dict] = {}

    def create(self, metadata: Optional[dict] = None) -> dict:
        code = secrets.token_urlsafe(8)
        rec = {
            "code": code,
            "status": "pending",  # pending -> complete | expired
            "api_key": None,
            "created_at": time.time(),
            "metadata": metadata or {},
        }
        self._sessions[code] = rec
        return rec

    def get(self, code: str) -> Optional[dict]:
        rec = self._sessions.get(code)
        if rec is None:
            return None
        if time.time() - rec["created_at"] > _ttl():
            rec["status"] = "expired"
        return rec

    def complete(self, code: str, api_key: str) -> bool:
        rec = self._sessions.get(code)
        if rec is None or rec["status"] == "expired":
            return False
        rec["status"] = "complete"
        rec["api_key"] = api_key
        return True

    def complete_by_session_id(self, session_id: str, api_key: str) -> bool:
        """Complete the pairing session whose metadata carries this Stripe
        checkout-session id (webhook completion path)."""
        for rec in self._sessions.values():
            if rec["metadata"].get("checkout_session_id") == session_id:
                return self.complete(rec["code"], api_key)
        return False

    def purge(self) -> None:
        now = time.time()
        ttl = _ttl()
        for code in [c for c, r in self._sessions.items() if now - r["created_at"] > ttl]:
            self._sessions.pop(code, None)


_store: Optional[CliSessionStore] = None


def get_cli_sessions() -> CliSessionStore:
    global _store
    if _store is None:
        _store = CliSessionStore()
    return _store
