"""Energy-descent invariant: settling cannot increase energy below -eps."""

import numpy as np

from oscillink_tpu.core.lattice import OscillinkLattice


def test_deltaH_nonnegative_after_settle():
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((60, 24)).astype(np.float32)
    psi = rng.standard_normal(24).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=6)
    lat.set_query(psi)
    lat.settle(max_iters=20, tol=1e-4)
    rec = lat.receipt()
    assert rec["deltaH_total"] >= -1e-3


def test_settle_converges():
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((40, 16)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=4)
    lat.set_query(rng.standard_normal(16).astype(np.float32))
    out = lat.settle(max_iters=50, tol=1e-4)
    assert out["res"] <= 1e-4
    assert out["iters"] >= 1


def test_ustar_stationarity():
    """M U* should equal the RHS to solver tolerance."""
    rng = np.random.default_rng(2)
    Y = rng.standard_normal((40, 16)).astype(np.float32)
    psi = rng.standard_normal(16).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=5)
    lat.set_query(psi)
    Ustar = lat.solve_Ustar(tol=1e-6, max_iters=200)

    from oscillink_tpu.oracle.reference import DenseOracle

    orc = DenseOracle(Y, k=5, deterministic_k=False)
    orc.set_query(psi)
    A_ours = lat.dense_adjacency()
    orc.A = A_ours
    from oscillink_tpu.oracle.reference import laplacian_dense

    orc.L, orc.sqrt_deg = laplacian_dense(A_ours)
    rhs = orc._rhs()
    resid = np.linalg.norm(orc._M_mul(Ustar) - rhs, axis=0).max()
    assert resid < 1e-3
