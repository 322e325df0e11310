"""Orbax checkpoint roundtrip + donated low-memory solve."""

import numpy as np
import pytest

from oscillink_tpu import OscillinkLattice


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((30, 10)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=4, deterministic_k=True, lamQ=2.0)
    lat.set_query(rng.standard_normal(10).astype(np.float32))
    lat.add_chain([0, 1, 2], lamP=0.3)
    p = str(tmp_path / "ckpt")
    lat.save_orbax(p)

    lat2 = OscillinkLattice.from_orbax(p)
    assert lat2.N == lat.N and lat2.D == lat.D
    assert lat2.lamQ == 2.0 and lat2.lamP == 0.3
    np.testing.assert_allclose(lat2.psi, lat.psi)
    np.testing.assert_allclose(lat2.B_diag, lat.B_diag)
    assert lat2.adjacency_fingerprint() == lat.adjacency_fingerprint()
    # identical receipts from the restored state
    r1 = lat.receipt()
    r2 = lat2.receipt()
    assert abs(r1["deltaH_total"] - r2["deltaH_total"]) < 1e-3


def test_chunked_solve_matches():
    import jax
    import jax.numpy as jnp

    from oscillink_tpu.models.coherence import (
        EnergyParams,
        solve_stationary,
        solve_stationary_chunked,
    )
    from oscillink_tpu.ops.graph import build_graph

    rng = np.random.default_rng(2)
    Y = jnp.asarray(rng.standard_normal((48, 16)).astype(np.float32))
    psi = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    B = jnp.ones(48, dtype=jnp.float32)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)
    g = jax.jit(lambda Y: build_graph(Y, 4))(Y)
    U_full, _, _ = jax.jit(
        lambda: solve_stationary(g, None, Y, psi, B, lam, tol=1e-6, max_iters=200)
    )()
    U_chunk, it, res = solve_stationary_chunked(
        g, None, Y, psi, B, lam, tol=1e-6, max_iters=200, col_chunks=4
    )
    np.testing.assert_allclose(
        np.asarray(U_chunk), np.asarray(U_full), rtol=1e-5, atol=1e-5
    )
    assert float(res) <= 1e-6 * 1.01


def test_lattice_forced_col_chunks(monkeypatch):
    """OSCILLINK_COL_CHUNKS routes the lattice's U* solve through the
    chunked path with matching results."""
    rng = np.random.default_rng(5)
    Y = rng.standard_normal((40, 12)).astype(np.float32)
    psi = rng.standard_normal(12).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=4, deterministic_k=True)
    lat.set_query(psi)
    U_full = lat.solve_Ustar(tol=1e-6, max_iters=200).copy()

    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "4")
    lat2 = OscillinkLattice(Y, kneighbors=4, deterministic_k=True)
    lat2.set_query(psi)
    assert lat2._auto_col_chunks() == 4
    U_chunk = lat2.solve_Ustar(tol=1e-6, max_iters=200)
    np.testing.assert_allclose(U_chunk, U_full, rtol=1e-5, atol=1e-5)
    # indivisible chunk request is ignored
    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "5")
    assert lat2._auto_col_chunks() == 1


def test_donated_solve_matches():
    import jax.numpy as jnp
    import jax

    from oscillink_tpu.models.coherence import (
        EnergyParams,
        solve_stationary,
        solve_stationary_donated,
    )
    from oscillink_tpu.ops.graph import build_graph

    rng = np.random.default_rng(1)
    Y_host = rng.standard_normal((48, 12)).astype(np.float32)
    psi = jnp.asarray(rng.standard_normal(12).astype(np.float32))
    B = jnp.ones(48, dtype=jnp.float32)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)
    g = jax.jit(lambda Y: build_graph(Y, 4))(jnp.asarray(Y_host))

    U_ref, _, _ = jax.jit(
        lambda Y: solve_stationary(g, None, Y, psi, B, lam, tol=1e-6, max_iters=200)
    )(jnp.asarray(Y_host))
    U_don, _, _ = solve_stationary_donated(
        g, None, jnp.asarray(Y_host), psi, B, lam, tol=1e-6, max_iters=200
    )
    np.testing.assert_allclose(np.asarray(U_don), np.asarray(U_ref), rtol=1e-5, atol=1e-5)
