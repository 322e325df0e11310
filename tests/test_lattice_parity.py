"""End-to-end numerical parity of the sparse TPU path vs the dense oracle."""

import numpy as np

from oscillink_tpu.core.lattice import OscillinkLattice
from oscillink_tpu.oracle.reference import DenseOracle, laplacian_dense


def _pair(n=56, d=20, k=5, seed=7, lamQ=4.0):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = rng.standard_normal(d).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=k, deterministic_k=True, lamQ=lamQ)
    lat.set_query(psi)
    orc = DenseOracle(Y, k=k, deterministic_k=True, lamQ=lamQ)
    orc.set_query(psi)
    # force identical adjacency so parity isolates the solver / receipts
    orc.A = lat.dense_adjacency()
    orc.L, orc.sqrt_deg = laplacian_dense(orc.A)
    return lat, orc


def test_ustar_parity():
    lat, orc = _pair()
    U_tpu = lat.solve_Ustar(tol=1e-6, max_iters=200)
    U_orc, _, _ = orc.solve_ustar(tol=1e-6, max_iters=200)
    np.testing.assert_allclose(U_tpu, U_orc, rtol=2e-4, atol=2e-4)


def test_settle_parity():
    lat, orc = _pair(seed=8)
    lat.settle(dt=1.0, max_iters=40, tol=1e-6)
    orc.settle(dt=1.0, max_iters=40, tol=1e-6)
    np.testing.assert_allclose(lat.U, orc.U, rtol=2e-4, atol=2e-4)


def test_deltaH_parity():
    lat, orc = _pair(seed=9)
    lat.settle(max_iters=30, tol=1e-5)
    orc.U = lat.U.copy()
    Ustar = lat.solve_Ustar(tol=1e-6, max_iters=200)
    rec = lat.receipt()
    dH_orc = orc.deltaH(orc.U, Ustar)
    assert abs(rec["deltaH_total"] - dH_orc) <= max(1e-3, 1e-3 * abs(dH_orc))


def test_per_node_parity():
    lat, orc = _pair(seed=10)
    Ustar = lat.solve_Ustar(tol=1e-6, max_iters=200)
    rec = lat.receipt()
    coh, anchor, query = orc.per_node(Ustar)
    np.testing.assert_allclose(rec["coh_drop_sum"], coh.sum(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(rec["anchor_pen_sum"], anchor.sum(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(rec["query_term_sum"], query.sum(), rtol=1e-3, atol=1e-3)


def test_null_points_parity():
    # anomalous cluster: one node dragged far away to trigger a null edge
    rng = np.random.default_rng(11)
    Y = rng.standard_normal((40, 12)).astype(np.float32)
    Y[7] = Y[3] + 0.01 * rng.standard_normal(12).astype(np.float32)  # near-dup edge
    psi = rng.standard_normal(12).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=4, deterministic_k=True)
    lat.set_query(psi)
    orc = DenseOracle(Y, k=4, deterministic_k=True)
    orc.set_query(psi)
    orc.A = lat.dense_adjacency()
    orc.L, orc.sqrt_deg = laplacian_dense(orc.A)
    Ustar = lat.solve_Ustar(tol=1e-6, max_iters=200)
    rec = lat.receipt()
    nulls_orc = orc.null_points(Ustar)
    edges_tpu = {tuple(n["edge"]) for n in rec["null_points"]}
    edges_orc = {tuple(n["edge"]) for n in nulls_orc}
    assert edges_tpu == edges_orc


def test_strict_logging_mode(monkeypatch):
    """OSCILLINK_STRICT_LOGGING surfaces logger/callback failures
    (reference checklist item; default keeps the swallow contract)."""
    import numpy as np
    import pytest

    import oscillink_tpu as ot

    rng = np.random.default_rng(0)
    Y = rng.standard_normal((20, 8)).astype(np.float32)
    lat = ot.Oscillink(Y, kneighbors=3)

    def bad_logger(event, payload):
        raise RuntimeError("broken sink")

    lat.set_logger(bad_logger)
    lat.settle(max_iters=4, tol=1e-2)  # default: swallowed

    monkeypatch.setenv("OSCILLINK_STRICT_LOGGING", "1")
    with pytest.raises(RuntimeError, match="broken sink"):
        lat.settle(max_iters=4, tol=1e-2)

    monkeypatch.delenv("OSCILLINK_STRICT_LOGGING")
    lat.set_logger(None)
    lat.add_settle_callback(lambda lattice, last: 1 / 0)
    lat.settle(max_iters=4, tol=1e-2)  # swallowed
    monkeypatch.setenv("OSCILLINK_STRICT_LOGGING", "1")
    with pytest.raises(ZeroDivisionError):
        lat.settle(max_iters=4, tol=1e-2)
