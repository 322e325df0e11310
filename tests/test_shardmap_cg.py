"""Explicit shard_map CG vs single-device solve on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from oscillink_tpu.models.coherence import EnergyParams, solve_stationary
from oscillink_tpu.ops.graph import build_graph
from oscillink_tpu.parallel.mesh import lattice_mesh
from oscillink_tpu.parallel.shardmap_cg import shardmap_solve


def test_shardmap_matches_single_device():
    rng = np.random.default_rng(0)
    N, D, K = 64, 16, 4
    Y = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    psi = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    B = jnp.ones(N, dtype=jnp.float32)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)

    g = jax.jit(lambda Y: build_graph(Y, K))(Y)
    U_ref, it_ref, res_ref = jax.jit(
        lambda: solve_stationary(g, None, Y, psi, B, lam, tol=1e-6, max_iters=200)
    )()

    mesh = lattice_mesh(8)
    U_sm, it_sm, res_sm = shardmap_solve(
        mesh, g, Y, psi, B, lam, tol=1e-6, max_iters=200
    )
    np.testing.assert_allclose(
        np.asarray(U_sm), np.asarray(U_ref), rtol=2e-4, atol=2e-4
    )
    assert float(res_sm) <= 1e-5
    # same iteration count: the collectives preserve the CG trajectory
    assert abs(int(it_sm) - int(it_ref)) <= 1


def test_shardmap_indivisible_raises():
    import pytest

    rng = np.random.default_rng(1)
    Y = jnp.asarray(rng.standard_normal((30, 8)).astype(np.float32))
    g = jax.jit(lambda Y: build_graph(Y, 3))(Y)
    mesh = lattice_mesh(8)
    with pytest.raises(ValueError):
        shardmap_solve(
            mesh, g, Y, jnp.zeros(8), jnp.ones(30), EnergyParams.make(1, 0.5, 4)
        )
