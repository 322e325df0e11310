"""Per-key TTL-LRU bundle cache (reference cloud/app/services/cache.py:29-73).

Keyed by (api_key, state_sig); entries expire after OSCILLINK_BUNDLE_CACHE_TTL
seconds (default 30) and the per-key LRU holds OSCILLINK_BUNDLE_CACHE_SIZE
entries (default 64).  Disabled when TTL <= 0.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from typing import Any, Optional


def _ttl() -> float:
    try:
        return float(os.getenv("OSCILLINK_BUNDLE_CACHE_TTL", "30"))
    except ValueError:
        return 30.0


def _size() -> int:
    try:
        return int(os.getenv("OSCILLINK_BUNDLE_CACHE_SIZE", "64"))
    except ValueError:
        return 64


class BundleCache:
    def __init__(self) -> None:
        self._per_key: dict[str, OrderedDict[str, dict]] = {}
        self._puts = 0

    def get(self, api_key: Optional[str], state_sig: str) -> Optional[dict]:
        ttl = _ttl()
        if ttl <= 0:
            return None
        bucket = self._per_key.get(api_key or "_anon_")
        if not bucket:
            return None
        rec = bucket.get(state_sig)
        if rec is None:
            return None
        if time.time() - rec["ts"] > ttl:
            bucket.pop(state_sig, None)
            return None
        bucket.move_to_end(state_sig)
        return rec

    def put(self, api_key: Optional[str], state_sig: str, bundle: list[dict[str, Any]]):
        ttl = _ttl()
        if ttl <= 0:
            return
        bucket = self._per_key.setdefault(api_key or "_anon_", OrderedDict())
        now = time.time()
        bucket[state_sig] = {"ts": now, "bundle": bundle}
        bucket.move_to_end(state_sig)
        while len(bucket) > _size():
            bucket.popitem(last=False)
        # periodic sweep: without it, expired bundles linger until the same
        # (key, sig) repeats, and buckets for rotated/revoked keys live
        # forever — unbounded memory on a long-lived instance
        self._puts += 1
        if self._puts % 256 == 0:
            for key in list(self._per_key):
                b = self._per_key[key]
                for sig in [s for s, r in list(b.items()) if now - r["ts"] > ttl]:
                    b.pop(sig, None)
                if not b:
                    self._per_key.pop(key, None)


class ReplayCache:
    """Idempotent-replay cache for settle-family responses (the reference
    CLOUD_ARCH_GCP.md open question — "ephemeral object cache … for
    idempotent replay? Possibly enterprise only" — implemented, opt-in).

    Keyed by SHA-256 of (endpoint, canonical JSON body, api key): an exact
    retry of a recent request is answered from cache WITHOUT recompute,
    quota charge, or usage append (retry semantics — the work was already
    paid for).  Off by default: enable with OSCILLINK_REPLAY_CACHE_TTL
    seconds; per-key LRU bound OSCILLINK_REPLAY_CACHE_SIZE (default 32).
    Within the TTL, adaptive-learner exploration jitter is deliberately
    not re-rolled (identical body => identical response)."""

    def __init__(self) -> None:
        self._per_key: dict[str, OrderedDict[str, dict]] = {}
        self._puts = 0

    @staticmethod
    def ttl() -> float:
        try:
            return float(os.getenv("OSCILLINK_REPLAY_CACHE_TTL", "0"))
        except ValueError:
            return 0.0

    @staticmethod
    def _size() -> int:
        try:
            return int(os.getenv("OSCILLINK_REPLAY_CACHE_SIZE", "32"))
        except ValueError:
            return 32

    @staticmethod
    def key(endpoint: str, body: Any, api_key: Optional[str]) -> str:
        import hashlib
        import json as _json

        canon = _json.dumps(body, sort_keys=True, separators=(",", ":"))
        tag = f"{endpoint}\x00{api_key or ''}\x00{canon}"
        return hashlib.sha256(tag.encode("utf-8")).hexdigest()

    def get(self, api_key: Optional[str], sig: str) -> Optional[dict]:
        ttl = self.ttl()
        if ttl <= 0:
            return None
        bucket = self._per_key.get(api_key or "_anon_")
        if not bucket:
            return None
        rec = bucket.get(sig)
        if rec is None:
            return None
        if time.time() - rec["ts"] > ttl:
            bucket.pop(sig, None)
            return None
        bucket.move_to_end(sig)
        return rec["body"]

    def put(self, api_key: Optional[str], sig: str, body: dict) -> None:
        ttl = self.ttl()
        if ttl <= 0:
            return
        bucket = self._per_key.setdefault(api_key or "_anon_", OrderedDict())
        now = time.time()
        bucket[sig] = {"ts": now, "body": body}
        bucket.move_to_end(sig)
        while len(bucket) > self._size():
            bucket.popitem(last=False)
        self._puts += 1
        if self._puts % 256 == 0:
            for key in list(self._per_key):
                b = self._per_key[key]
                for s in [s for s, r in list(b.items()) if now - r["ts"] > ttl]:
                    b.pop(s, None)
                if not b:
                    self._per_key.pop(key, None)
