"""Graph-build invariants and parity with the dense NumPy oracle."""

import numpy as np
import pytest

from oscillink_tpu.core.lattice import OscillinkLattice
from oscillink_tpu.oracle.reference import (
    laplacian_dense,
    mutual_knn_dense,
    row_sum_cap_dense,
)


def _rand(n=48, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def test_adjacency_matches_dense_oracle():
    Y = _rand()
    lat = OscillinkLattice(Y, kneighbors=5, deterministic_k=True)
    A_oracle = row_sum_cap_dense(mutual_knn_dense(Y, 5, deterministic=True), 1.0)
    A_ours = lat.dense_adjacency()
    assert A_ours.shape == A_oracle.shape
    # identical support
    assert np.array_equal(A_ours > 0, A_oracle > 0)
    np.testing.assert_allclose(A_ours, A_oracle, rtol=1e-5, atol=1e-6)


def test_adjacency_symmetry():
    Y = _rand(seed=1)
    lat = OscillinkLattice(Y, kneighbors=6)
    A = lat.dense_adjacency()
    np.testing.assert_array_equal(A, A.T)


def test_row_sum_cap_parity_and_damping():
    # geometric-mean scaling doesn't strictly enforce the cap (a neighbor at
    # scale 1 lifts sqrt(s_i s_j) above s_i) — assert parity with the oracle
    # and that over-cap rows are damped.
    Y = _rand(seed=2)
    lat = OscillinkLattice(Y, kneighbors=8, row_cap_val=0.7, deterministic_k=True)
    A = lat.dense_adjacency()
    A_oracle = row_sum_cap_dense(mutual_knn_dense(Y, 8, deterministic=True), 0.7)
    np.testing.assert_allclose(A, A_oracle, rtol=1e-4, atol=1e-5)
    uncapped = mutual_knn_dense(Y, 8, deterministic=True)
    over = uncapped.sum(axis=1) > 0.7
    assert np.all(A.sum(axis=1)[over] < uncapped.sum(axis=1)[over])


def test_sqrt_deg_matches_oracle():
    Y = _rand(seed=3)
    lat = OscillinkLattice(Y, kneighbors=5, deterministic_k=True)
    A = row_sum_cap_dense(mutual_knn_dense(Y, 5, deterministic=True), 1.0)
    _, sqrt_deg = laplacian_dense(A)
    np.testing.assert_allclose(lat.sqrt_deg, sqrt_deg, rtol=1e-5, atol=1e-6)


def test_deterministic_build_reproducible():
    Y = _rand(seed=4)
    a = OscillinkLattice(Y, kneighbors=6, deterministic_k=True)
    b = OscillinkLattice(Y.copy(), kneighbors=6, deterministic_k=True)
    assert a.adjacency_fingerprint() == b.adjacency_fingerprint()
    np.testing.assert_array_equal(a.dense_adjacency(), b.dense_adjacency())


def test_seeded_build_reproducible():
    Y = _rand(seed=5)
    a = OscillinkLattice(Y, kneighbors=6, neighbor_seed=42)
    b = OscillinkLattice(Y.copy(), kneighbors=6, neighbor_seed=42)
    assert a.adjacency_fingerprint() == b.adjacency_fingerprint()


def test_kneighbors_clamped():
    Y = _rand(n=5, d=8)
    lat = OscillinkLattice(Y, kneighbors=50)
    assert lat._kneighbors == 4


def test_param_validation():
    Y = _rand(n=8, d=4)
    with pytest.raises(ValueError):
        OscillinkLattice(Y, kneighbors=0)
    with pytest.raises(ValueError):
        OscillinkLattice(Y, lamG=0.0)
    with pytest.raises(ValueError):
        OscillinkLattice(Y, lamC=-1.0)
    with pytest.raises(ValueError):
        OscillinkLattice(np.zeros(3, dtype=np.float32))  # 1-D rejected


def test_rebuild_graph_changes_k():
    Y = _rand(seed=6)
    lat = OscillinkLattice(Y, kneighbors=3, deterministic_k=True)
    fp3 = lat.adjacency_fingerprint()
    lat.rebuild_graph(kneighbors=7)
    assert lat._kneighbors == 7
    assert lat.adjacency_fingerprint() != fp3
