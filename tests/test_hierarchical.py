"""Hierarchical lattice-of-lattices composition (SCALING.md contract)."""

import numpy as np
import pytest

from oscillink_tpu.parallel.hierarchical import hierarchical_settle


def test_hierarchical_composition():
    rng = np.random.default_rng(0)
    N, D = 128, 16
    # topical structure: shard 0 carries the query topic
    topic = rng.standard_normal(D).astype(np.float32)
    Y = rng.standard_normal((N, D)).astype(np.float32)
    Y[:16] += 2.0 * topic  # first shard strongly on-topic
    psi = topic / np.linalg.norm(topic)

    out = hierarchical_settle(Y, psi, n_shards=8, kneighbors=4, tol=1e-5)
    assert out["n_shards"] == 8
    assert len(out["shard_receipts"]) == 8
    for r in out["shard_receipts"]:
        assert np.isfinite(r["deltaH"]) and r["iters"] >= 1
    assert np.isfinite(out["deltaH_composed"])
    # the on-topic shard must rank first in the super-lattice
    assert out["super"]["ranking"][0] == 0
    assert out["composition_sig"]


def test_hierarchical_deterministic():
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((64, 12)).astype(np.float32)
    psi = rng.standard_normal(12).astype(np.float32)
    a = hierarchical_settle(Y, psi, n_shards=4, kneighbors=3)
    b = hierarchical_settle(Y.copy(), psi.copy(), n_shards=4, kneighbors=3)
    assert a["composition_sig"] == b["composition_sig"]


def test_hierarchical_indivisible_raises():
    rng = np.random.default_rng(2)
    Y = rng.standard_normal((30, 8)).astype(np.float32)
    psi = rng.standard_normal(8).astype(np.float32)
    with pytest.raises(ValueError):
        hierarchical_settle(Y, psi, n_shards=7)


def test_hierarchical_gates_shape():
    rng = np.random.default_rng(3)
    Y = rng.standard_normal((32, 8)).astype(np.float32)
    psi = rng.standard_normal(8).astype(np.float32)
    gates = rng.uniform(0, 1, 32).astype(np.float32)
    out = hierarchical_settle(Y, psi, gates=gates, n_shards=4, kneighbors=3)
    assert len(out["super"]["align"]) == 4
