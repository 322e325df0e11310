"""Multi-query batched solves over a shared graph (DP analog)."""

import numpy as np
import pytest

from oscillink_tpu import OscillinkLattice


def _lat(n=40, d=12, seed=0):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    return OscillinkLattice(Y, kneighbors=4, deterministic_k=True), rng


def test_batch_matches_sequential():
    lat, rng = _lat()
    psis = rng.standard_normal((3, lat.D)).astype(np.float32)
    Ustars = lat.solve_Ustar_batch(psis, tol=1e-6, max_iters=200)
    assert Ustars.shape == (3, lat.N, lat.D)
    for qi in range(3):
        lat.set_query(psis[qi])
        U_seq = lat.solve_Ustar(tol=1e-6, max_iters=200)
        np.testing.assert_allclose(Ustars[qi], U_seq, rtol=3e-4, atol=3e-4)


def test_batch_gates():
    lat, rng = _lat(seed=1)
    psis = rng.standard_normal((2, lat.D)).astype(np.float32)
    gates = rng.uniform(0.1, 1.0, (2, lat.N)).astype(np.float32)
    Ustars = lat.solve_Ustar_batch(psis, gates=gates)
    assert np.all(np.isfinite(Ustars))


def test_batch_validation():
    lat, rng = _lat(seed=2)
    with pytest.raises(ValueError):
        lat.solve_Ustar_batch(np.zeros((2, lat.D + 1), dtype=np.float32))
    with pytest.raises(ValueError):
        lat.solve_Ustar_batch(
            np.zeros((2, lat.D), dtype=np.float32),
            gates=np.ones((3, lat.N), dtype=np.float32),
        )


def test_settle_lattice_batch_matches_individual():
    """Batch-of-lattices vmap agrees with per-corpus settles."""
    import jax.numpy as jnp

    from oscillink_tpu.models.batched import settle_lattice_batch
    from oscillink_tpu.models.coherence import EnergyParams

    rng = np.random.default_rng(4)
    Bsz, N, D, K = 3, 32, 10, 3
    Ys = rng.standard_normal((Bsz, N, D)).astype(np.float32)
    psis = rng.standard_normal((Bsz, D)).astype(np.float32)
    gates = np.ones((Bsz, N), dtype=np.float32)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)
    U_batch, iters, res = settle_lattice_batch(
        jnp.asarray(Ys), jnp.asarray(psis), jnp.asarray(gates), lam, K,
        tol=1e-5, max_iters=50,
    )
    for b in range(Bsz):
        lat = OscillinkLattice(Ys[b], kneighbors=K)
        lat.set_query(psis[b])
        lat.settle(tol=1e-5, max_iters=50)
        np.testing.assert_allclose(
            np.asarray(U_batch[b]), lat.U, rtol=3e-4, atol=3e-4
        )


def test_bundle_batch_matches_single():
    lat, rng = _lat(seed=3)
    psis = rng.standard_normal((2, lat.D)).astype(np.float32)
    bundles = lat.bundle_batch(psis, k=5)
    assert len(bundles) == 2 and all(len(b) == 5 for b in bundles)
    lat.set_query(psis[0])
    single = lat.bundle(k=5)
    assert [e["id"] for e in bundles[0]] == [e["id"] for e in single]
