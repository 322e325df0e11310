"""Adaptive learner behavior: clipping, exploration, EMA, promotion guardrails."""

import numpy as np
import pytest

from oscillink_tpu.service.learners import Learners, MemoryProfileStore, _clip


def test_clip_bounds():
    assert _clip("lamG", 100.0) == 2.0
    assert _clip("lamG", 0.0) == 0.5
    assert _clip("lamC", 1.0) == 1.0
    assert _clip("lamQ", 0.1) == 1.0
    assert _clip("kneighbors", 1000) == 64
    assert _clip("kneighbors", 0) == 1
    assert _clip("unknown", 42) == 42


def test_disabled_returns_baseline(monkeypatch):
    monkeypatch.delenv("OSCILLINK_ADAPTIVE_PROFILES", raising=False)
    learners = Learners()
    assert learners.get_active_profile("key") == ("baseline", {})
    assert learners.propose_overrides("key") == ("baseline", {})


def test_active_profile_clipped(monkeypatch):
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_PROFILES", "1")
    store = MemoryProfileStore()
    store.set(
        "k1",
        {
            "active_profile_id": "p-test",
            "learned_params": {"lamG": 50.0, "lamC": 0.7, "kneighbors": 200},
        },
    )
    learners = Learners(store)
    prof, overrides = learners.get_active_profile("k1")
    assert prof == "p-test"
    assert overrides == {"lamG": 2.0, "lamC": 0.7, "kneighbors": 64}


def test_exploration_proposes_within_bounds(monkeypatch):
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_PROFILES", "1")
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_LEARN", "1")
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_EPS", "1.0")  # always explore
    learners = Learners()
    prof, overrides = learners.propose_overrides("k1", base={"lamQ": 4.0})
    assert prof == "explore"
    assert 0.5 <= overrides["lamG"] <= 2.0
    assert 1.0 <= overrides["lamQ"] <= 8.0
    assert 1 <= overrides["kneighbors"] <= 64


def test_promotion_guardrails(monkeypatch):
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_PROFILES", "1")
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_LEARN", "1")
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_MIN_OBS", "3")
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_MIN_PROMOTE_SEC", "0")
    store = MemoryProfileStore()
    learners = Learners(store)
    # below min obs: no promotion even for explore observations
    for _ in range(2):
        learners.record_observation("k1", "explore", {"lamQ": 5.0}, {"duration_ms": 10})
    assert not (store.get("k1") or {}).get("learned_params")
    # after min obs + improving score, promotion happens
    learners.record_observation("k1", "explore", {"lamQ": 5.0}, {"duration_ms": 1})
    doc = store.get("k1")
    assert doc["obs_count"] == 3
    assert doc["learned_params"].get("lamQ") == 5.0
    assert doc["active_profile_id"].startswith("p-")


def test_observation_updates_ema(monkeypatch):
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_PROFILES", "1")
    monkeypatch.setenv("OSCILLINK_ADAPTIVE_LEARN", "1")
    store = MemoryProfileStore()
    learners = Learners(store)
    learners.record_observation("k1", "baseline", {}, {"duration_ms": 100.0, "residual": 0.0})
    e1 = store.get("k1")["ema_score"]
    assert e1 == pytest.approx(-100.0)
    learners.record_observation("k1", "baseline", {}, {"duration_ms": 50.0, "residual": 0.0})
    e2 = store.get("k1")["ema_score"]
    assert -100.0 < e2 < -50.0
