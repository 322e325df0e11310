"""Fused windowed operator: kernel identity, fused CG algebra, lattice routing.

The fused path (`k_matvec_windowed` + `cg_solve_kpap`) folds the operator
diagonal and the CG denominator into the windowed kernel pass
(reference operator contract: oscillink/core/lattice.py:173-182 — the fold
changes float association only, never the operator).  On the CPU test mesh
the kernel runs its composition fallback; the Mosaic kernel itself is
measured/parity-checked on the real chip (benchmarks/probe_fused_cg.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import oscillink_tpu as ot
from oscillink_tpu.ops.graph import build_graph, lap_matvec
from oscillink_tpu.ops.pallas import window_spmv as ws
from oscillink_tpu.ops.solver import cg_solve, cg_solve_kpap


def _clustered(n, d, n_centers=8, seed=0, spread=0.25):
    rng = np.random.default_rng(seed)
    centers = 4.0 * rng.standard_normal((n_centers, d)).astype(np.float32)
    lbl = np.sort(rng.integers(0, n_centers, size=n))
    return (centers[lbl] + spread * rng.standard_normal((n, d))).astype(np.float32)


def test_k_matvec_windowed_identity():
    """K(X) = g ⊙ X − Wn X == (g − 1) ⊙ X + L_win X, with exact pap."""
    rng = np.random.default_rng(0)
    n, d, k = 1500, 64, 6
    Y = _clustered(n, d)
    g = jax.jit(lambda Y: build_graph(Y, k))(jnp.asarray(Y))
    plan, _ = ws.build_window_plan(np.asarray(g.idx), np.asarray(g.wn), W=512, R=256)
    oh = ws.build_onehot(plan, 512, ws.plan_s_max(plan))
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)
    diag = jnp.asarray(
        (1.7 + rng.random(plan.n_pad)).astype(np.float32)[:, None]
    )
    out, pap = ws.k_matvec_windowed(plan, oh, Xp, diag, W=512, R=256)
    lap = ws.lap_matvec_windowed(plan, oh, Xp, W=512, R=256)
    ref = (diag - 1.0) * Xp + lap
    rel = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-12))
    assert rel < 1e-5
    pap_ref = jnp.sum(Xp * ref, axis=0)
    prel = float(jnp.abs(pap - pap_ref).max() / (jnp.abs(pap_ref).max() + 1e-12))
    assert prel < 1e-4
    # L X on real rows matches the gather matvec (padding passes through)
    gref = np.asarray(lap_matvec(g, jnp.asarray(X)))
    lrel = np.abs(np.asarray(lap)[:n] - gref).max() / (np.abs(gref).max() + 1e-12)
    assert lrel < 1e-5


def test_cg_kpap_matches_cg_solve():
    """Same solution/iters as `cg_solve` when A = s·K on a dense SPD system."""
    rng = np.random.default_rng(1)
    n, d = 96, 8
    Q = rng.standard_normal((n, n)).astype(np.float32)
    A = (Q @ Q.T / n + 2.0 * np.eye(n)).astype(np.float32)
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    M_diag = jnp.asarray(np.diag(A))
    s = 0.7

    x1, i1, r1 = cg_solve(lambda x: Aj @ x, b, M_diag=M_diag, tol=1e-5, max_iters=80)

    inv_s = 1.0 / s

    def K_mul(x):
        kx = (Aj @ x) * inv_s
        return kx, jnp.sum(x * kx, axis=0)

    x2, i2, r2 = cg_solve_kpap(K_mul, s, b, M_diag=M_diag, tol=1e-5, max_iters=80)
    # ±1 iteration tolerance: the denominators (⟨p,Ap⟩ vs s·⟨p,Kp⟩) round
    # differently, so a borderline res-vs-tol comparison can flip by one
    # iteration across backends/compiler versions.
    assert abs(int(i1) - int(i2)) <= 1
    rel = float(jnp.abs(x1 - x2).max() / (jnp.abs(x1).max() + 1e-12))
    assert rel < 1e-4
    # both actually solve the system
    res = float(jnp.linalg.norm(Aj @ x2 - b) / jnp.linalg.norm(b))
    assert res < 1e-4


def _settle_receipt(Y, psi, monkeypatch, windowed, fused):
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1" if windowed else "0")
    monkeypatch.setenv("OSCILLINK_WINDOWED_FUSED", "1" if fused else "0")
    lat = ot.Oscillink(Y, kneighbors=6)
    lat.set_query(psi)
    if windowed:
        assert lat._window_ctx is not None
    out = lat.settle(max_iters=16, tol=1e-4)
    rec = lat.receipt()
    ids = [e["id"] for e in lat.bundle(k=5)]
    return out, rec, ids


@pytest.mark.parametrize("seed", [0, 3])
def test_lattice_fused_windowed_parity(monkeypatch, seed):
    """Fused vs unfused windowed vs gather: same physics within CG tolerance."""
    Y = _clustered(1400, 64, seed=seed)
    psi = Y[:40].mean(0)
    psi = (psi / (np.linalg.norm(psi) + 1e-12)).astype(np.float32)

    _, rec_f, ids_f = _settle_receipt(Y, psi, monkeypatch, True, True)
    _, rec_u, ids_u = _settle_receipt(Y, psi, monkeypatch, True, False)
    _, rec_g, ids_g = _settle_receipt(Y, psi, monkeypatch, False, False)

    dh_f, dh_u, dh_g = (
        r["deltaH_total"] for r in (rec_f, rec_u, rec_g)
    )
    assert dh_f == pytest.approx(dh_u, rel=2e-3)
    assert dh_f == pytest.approx(dh_g, rel=2e-3)
    assert ids_f == ids_u == ids_g


def test_lattice_fused_lamC_zero_routes_unfused(monkeypatch):
    """λ_C = 0 makes the diag/scale fold undefined; the router must fall
    back to the unfused form and still match the gather path."""
    Y = _clustered(1200, 48, seed=5)
    psi = (Y[0] / (np.linalg.norm(Y[0]) + 1e-12)).astype(np.float32)
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1")
    monkeypatch.setenv("OSCILLINK_WINDOWED_FUSED", "1")
    lat = ot.Oscillink(Y, kneighbors=6, lamC=0.0)
    lat.set_query(psi)
    lat.settle(max_iters=12, tol=1e-4)
    rec = lat.receipt()

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "0")
    lat2 = ot.Oscillink(Y, kneighbors=6, lamC=0.0)
    lat2.set_query(psi)
    lat2.settle(max_iters=12, tol=1e-4)
    rec2 = lat2.receipt()
    assert rec["deltaH_total"] == pytest.approx(rec2["deltaH_total"], rel=2e-3)
