"""Opt-in window-pass precision tiers (OSCILLINK_WINDOW_PRECISION).

The default "bf16x3" three-pass split carries receipt-parity accuracy
(rel ~1e-6, tests/test_window_spmv.py).  "bf16x2" drops one MXU pass
(truncating the per-iteration CG vector to bf16, ~2e-3 worst-case operator
error) and "bf16" runs a single pass (~8e-3).  On-chip measurement
(benchmarks/window_precision_125k.json) shows the kernel is DMA-bound, so
the tiers buy only ~0.1-0.2 ms/apply — they remain opt-in diagnostics, not
a recommended configuration.  These tests run the interpret-mode kernel on
the CPU mesh; the same code lowers through Mosaic on TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oscillink_tpu.ops.graph import Graph, lap_matvec
from oscillink_tpu.ops.pallas import window_spmv as ws


@pytest.fixture(scope="module")
def banded_case():
    rng = np.random.default_rng(12)
    n, d, k = 2048, 64, 6
    idx = ((np.arange(n)[:, None] + rng.integers(-300, 300, size=(n, k))) % n).astype(
        np.int32
    )
    wn = (rng.random((n, k)) * 0.1).astype(np.float32)
    g = Graph(
        idx=jnp.asarray(idx), w=jnp.asarray(wn), wn=jnp.asarray(wn),
        sqrt_deg=jnp.ones(n),
    )
    plan, cov = ws.build_window_plan(idx, wn, W=512, R=256, n_windows=2)
    oh = ws.build_onehot(plan, 512, ws.plan_s_max(plan))
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)
    ref = np.asarray(lap_matvec(g, jnp.asarray(X)))
    return plan, oh, X, Xp, ref, n


@pytest.mark.parametrize(
    "precision,bound",
    [("bf16x3", 1e-5), ("bf16x2", 5e-3), ("bf16", 3e-2)],
)
def test_precision_tier_accuracy(banded_case, precision, bound):
    plan, oh, X, Xp, ref, n = banded_case
    out = np.asarray(
        ws.lap_matvec_windowed(plan, oh, Xp, W=512, R=256, precision=precision)
    )[:n]
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel < bound, (precision, rel)


def test_bf16x2_strictly_coarser_than_bf16x3(banded_case):
    plan, oh, X, Xp, ref, n = banded_case
    r3 = np.asarray(
        ws.lap_matvec_windowed(plan, oh, Xp, W=512, R=256, precision="bf16x3")
    )[:n]
    r2 = np.asarray(
        ws.lap_matvec_windowed(plan, oh, Xp, W=512, R=256, precision="bf16x2")
    )[:n]
    scale = np.abs(ref).max() + 1e-12
    assert np.abs(r3 - ref).max() / scale < np.abs(r2 - ref).max() / scale


def test_env_resolution(monkeypatch):
    monkeypatch.delenv("OSCILLINK_WINDOW_PRECISION", raising=False)
    assert ws._env_precision() == "bf16x3"
    monkeypatch.setenv("OSCILLINK_WINDOW_PRECISION", "bf16x2")
    assert ws._env_precision() == "bf16x2"
    monkeypatch.setenv("OSCILLINK_WINDOW_PRECISION", "BF16")
    assert ws._env_precision() == "bf16"
    monkeypatch.setenv("OSCILLINK_WINDOW_PRECISION", "fp8")  # unknown -> default
    assert ws._env_precision() == "bf16x3"


def test_env_routes_default_precision(banded_case, monkeypatch):
    """precision=None resolves from the env at call time (public wrappers)."""
    plan, oh, X, Xp, ref, n = banded_case
    monkeypatch.setenv("OSCILLINK_WINDOW_PRECISION", "bf16")
    out_env = np.asarray(ws.lap_matvec_windowed(plan, oh, Xp, W=512, R=256))[:n]
    out_exp = np.asarray(
        ws.lap_matvec_windowed(plan, oh, Xp, W=512, R=256, precision="bf16")
    )[:n]
    assert np.array_equal(out_env, out_exp)


def test_fused_operator_honors_precision(banded_case):
    """k_matvec_windowed's composition path threads the tier too."""
    plan, oh, X, Xp, ref, n = banded_case
    g = jnp.full((plan.n_pad, 1), 2.0, jnp.float32)
    out3, pap3 = ws.k_matvec_windowed(plan, oh, Xp, g, precision="bf16x3")
    out2, pap2 = ws.k_matvec_windowed(plan, oh, Xp, g, precision="bf16x2")
    ref_k = np.array((g - 1.0) * Xp)
    ref_k[:n] += ref
    scale = np.abs(ref_k).max() + 1e-12
    e3 = np.abs(np.asarray(out3) - ref_k).max() / scale
    e2 = np.abs(np.asarray(out2) - ref_k).max() / scale
    assert e3 < 1e-5 and e2 < 5e-3 and e3 < e2


def test_bf16x2_cg_solve_converges(banded_case):
    """CG over the bf16x2 operator still reaches a usable solution: the
    perturbed-operator fixed point sits within ~1e-2 of the exact one."""
    from oscillink_tpu.ops.solver import cg_solve

    plan, oh, X, Xp, ref, n = banded_case
    rng = np.random.default_rng(13)
    b = jnp.asarray(rng.standard_normal((plan.n_pad, 64)).astype(np.float32))

    def mk(precision):
        def M_mul(v):
            return 2.0 * v + ws.lap_matvec_windowed(
                plan, oh, v, W=512, R=256, precision=precision
            )

        return M_mul

    x_ref, _, _ = cg_solve(mk("bf16x3"), b, tol=1e-6, max_iters=64)
    x_2, _, _ = cg_solve(mk("bf16x2"), b, tol=1e-6, max_iters=64)
    rel = np.abs(np.asarray(x_2 - x_ref)).max() / (
        np.abs(np.asarray(x_ref)).max() + 1e-12
    )
    assert rel < 1e-2, rel


def test_receipt_meta_surfaces_active_tier(monkeypatch):
    """Receipts carry `meta.window_precision` whenever the windowed kernel
    served the solve (ADVICE r4): reduced tiers change settle numerics and
    state_sig, so a fleet with mismatched OSCILLINK_WINDOW_PRECISION values
    must be diagnosable from its responses.  Absent on non-windowed paths."""
    from oscillink_tpu import OscillinkLattice

    rng = np.random.default_rng(9)
    n, d = 600, 32
    centers = rng.standard_normal((6, d)).astype(np.float32)
    Y = (centers[np.arange(n) % 6] + 0.2 * rng.standard_normal((n, d))).astype(
        np.float32
    )
    psi = rng.standard_normal(d).astype(np.float32)

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1")
    monkeypatch.setenv("OSCILLINK_WINDOW_PRECISION", "bf16x2")
    lat = OscillinkLattice(Y, kneighbors=5)
    assert lat._window_ctx is not None
    lat.set_query(psi)
    rec = lat.receipt()
    assert rec["meta"]["window_precision"] == "bf16x2"

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "0")
    monkeypatch.delenv("OSCILLINK_WINDOW_PRECISION", raising=False)
    lat2 = OscillinkLattice(Y, kneighbors=5)
    assert lat2._window_ctx is None
    lat2.set_query(psi)
    assert "window_precision" not in lat2.receipt()["meta"]
