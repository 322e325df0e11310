"""Multi-device row-sharded settle on the 8-device virtual CPU mesh."""

import numpy as np
import jax

from oscillink_tpu.parallel import lattice_mesh, sharded_build_and_settle


def test_sharded_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should carve 8 virtual devices"
    rng = np.random.default_rng(0)
    N, D = 64, 16
    Y = rng.standard_normal((N, D)).astype(np.float32)
    psi = rng.standard_normal(D).astype(np.float32)

    mesh8 = lattice_mesh(8)
    out8 = sharded_build_and_settle(Y, psi, k=4, mesh=mesh8, tol=1e-5, max_iters=50)
    mesh1 = lattice_mesh(1)
    out1 = sharded_build_and_settle(Y, psi, k=4, mesh=mesh1, tol=1e-5, max_iters=50)

    np.testing.assert_allclose(
        np.asarray(out8["U"]), np.asarray(out1["U"]), rtol=1e-4, atol=1e-4
    )
    assert abs(out8["deltaH"] - out1["deltaH"]) <= max(1e-2, 1e-3 * abs(out1["deltaH"]))
    assert out8["mesh_devices"] == 8


def test_sharded_matches_lattice_container():
    rng = np.random.default_rng(1)
    N, D = 48, 12
    Y = rng.standard_normal((N, D)).astype(np.float32)
    psi = rng.standard_normal(D).astype(np.float32)

    out = sharded_build_and_settle(
        Y, psi, k=4, mesh=lattice_mesh(8), tol=1e-6, max_iters=100
    )

    from oscillink_tpu import OscillinkLattice

    lat = OscillinkLattice(Y, kneighbors=4)
    lat.set_query(psi)
    Ustar = lat.solve_Ustar(tol=1e-6, max_iters=100)
    np.testing.assert_allclose(np.asarray(out["Ustar"]), Ustar, rtol=2e-4, atol=2e-4)


def test_indivisible_n_raises():
    import pytest

    rng = np.random.default_rng(2)
    Y = rng.standard_normal((30, 8)).astype(np.float32)
    psi = rng.standard_normal(8).astype(np.float32)
    with pytest.raises(ValueError):
        sharded_build_and_settle(Y, psi, k=3, mesh=lattice_mesh(8))
