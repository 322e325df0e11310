"""Universal model adapter (adapters/registry.py) — the reference roadmap's
planned `oscillink-adapters` package: provider registry, auto-detection,
unit-norm + dtype/shape validation, content-hash TTL cache."""

import numpy as np
import pytest

from oscillink_tpu.adapters.registry import (
    CachedEmbedder,
    _ValidatedProvider,
    auto_detect,
    available_providers,
    register_provider,
    resolve_provider,
)


def test_hash_provider_resolves_and_normalizes():
    p = resolve_provider("hash")
    v = p.embed(["alpha", "beta"])
    assert v.shape == (2, 384) and v.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    # "name:model" spec — hash takes the dim as its model string
    v256 = resolve_provider("hash:256").embed(["alpha"])
    assert v256.shape == (1, 256)


def test_lsa_provider_fits_then_embeds_consistently():
    p = resolve_provider("lsa:8")
    corpus = ["mars red planet moons", "paris france capital",
              "bees honey pollinate", "mars olympus mons volcano"]
    Y = p.embed(corpus)
    q = p.embed(["tell me about mars"])
    assert Y.shape[0] == 4 and q.shape == (1, Y.shape[1])
    assert int(np.argmax(Y @ q[0])) in (0, 3)


def test_unknown_provider_and_env_override(monkeypatch):
    with pytest.raises(KeyError):
        resolve_provider("no-such-backend")
    monkeypatch.setenv("OSCILLINK_EMBED_PROVIDER", "hash:16")
    v = resolve_provider(None).embed(["x"])
    assert v.shape == (1, 16)


def test_auto_detect_falls_back_to_hash(monkeypatch):
    # no API keys in this image and ST is either absent or uncached offline;
    # force the deterministic branch
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    monkeypatch.delenv("COHERE_API_KEY", raising=False)
    monkeypatch.setenv("OSCILLINK_DISABLE_ST", "1")
    from oscillink_tpu.adapters.text import _load_st_model

    _load_st_model.cache_clear()
    p = auto_detect()
    assert p.name == "hash"
    _load_st_model.cache_clear()


def test_api_providers_fail_actionably(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(RuntimeError, match="package|OPENAI_API_KEY"):
        resolve_provider("openai")
    assert {"openai", "cohere", "anthropic", "huggingface", "hash", "st",
            "lsa"} <= set(available_providers())


def test_validation_rejects_bad_provider_output():
    bad_shape = _ValidatedProvider("bad", lambda ts: np.zeros((99, 4)))
    with pytest.raises(ValueError, match="shape"):
        bad_shape.embed(["a"])
    bad_dtype = _ValidatedProvider("bad", lambda ts: np.zeros((1, 4), dtype=np.int32))
    with pytest.raises(ValueError, match="dtype"):
        bad_dtype.embed(["a"])
    bad_val = _ValidatedProvider("bad", lambda ts: np.full((1, 4), np.nan))
    with pytest.raises(ValueError, match="finite"):
        bad_val.embed(["a"])


def test_register_provider_plugs_in():
    calls = []

    def factory(model):
        return _ValidatedProvider(
            "toy", lambda ts: (calls.append(len(ts)),
                               np.ones((len(ts), 4), dtype=np.float32))[1]
        )

    register_provider("toy", factory)
    try:
        v = resolve_provider("toy").embed(["a", "b"])
        assert v.shape == (2, 4) and calls == [2]
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)
    finally:
        from oscillink_tpu.adapters import registry

        registry._REGISTRY.pop("toy", None)


def test_cache_hits_ttl_and_partial_batches():
    calls = []
    prov = _ValidatedProvider(
        "count", lambda ts: (calls.append(list(ts)),
                             np.asarray([[hash(t) % 7 + 1.0, 1.0] for t in ts],
                                        dtype=np.float32))[1]
    )
    t = {"now": 0.0}
    ce = CachedEmbedder(prov, ttl_s=10.0, max_items=3, clock=lambda: t["now"])

    v1 = ce.embed(["a", "b"])
    assert calls == [["a", "b"]] and ce.misses == 2 and ce.hits == 0
    v2 = ce.embed(["b", "a"])  # full hit, order preserved
    assert calls == [["a", "b"]] and ce.hits == 2
    np.testing.assert_array_equal(v2[0], v1[1])
    np.testing.assert_array_equal(v2[1], v1[0])

    ce.embed(["a", "c"])  # partial: only "c" goes to the provider
    assert calls[-1] == ["c"]

    t["now"] = 11.0  # TTL expiry: everything re-embeds
    ce.embed(["a"])
    assert calls[-1] == ["a"]

    # LRU bound: max_items=3 evicts the oldest entries
    ce.embed(["d", "e", "f", "g"])
    assert len(ce._store) <= 3


def test_cache_key_includes_provider_name():
    p1 = _ValidatedProvider("p1", lambda ts: np.ones((len(ts), 2), dtype=np.float32))
    p2 = _ValidatedProvider("p2", lambda ts: 2 * np.ones((len(ts), 2), dtype=np.float32))
    c1, c2 = CachedEmbedder(p1), CachedEmbedder(p2)
    assert c1._key("x") != c2._key("x")


def test_cache_key_includes_model():
    """Review fix: hash:256 and hash:384 (same provider name) must never
    share cache entries."""
    c1 = CachedEmbedder(resolve_provider("hash:256"))
    c2 = CachedEmbedder(resolve_provider("hash:384"))
    assert c1._key("x") != c2._key("x")
    v = c1.embed(["x"])
    assert v.shape == (1, 256)
    assert c2.embed(["x"]).shape == (1, 384)
