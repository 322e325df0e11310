"""Halo-exchange sharded CG vs single-device solve (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from oscillink_tpu.models.coherence import EnergyParams, solve_stationary
from oscillink_tpu.ops.graph import build_graph
from oscillink_tpu.parallel.halo_cg import build_halo_plan, halo_solve
from oscillink_tpu.parallel.mesh import lattice_mesh
from oscillink_tpu.parallel.reorder import apply_order, pca_bisection_order


def _clustered(n, d, seed=0):
    rng = np.random.default_rng(seed)
    centers = 4.0 * rng.standard_normal((16, d)).astype(np.float32)
    assign = rng.integers(0, 16, size=n)
    return centers[assign] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)


def test_halo_plan_consistency():
    Y = _clustered(256, 16)
    order = pca_bisection_order(Y, levels=3)
    (Y,) = apply_order(order, Y)[:1]
    g = jax.jit(lambda Y: build_graph(Y, 4))(jnp.asarray(Y))
    idx, w = np.asarray(g.idx), np.asarray(g.w)
    plan = build_halo_plan(idx, w, 8)
    rows_per = plan.rows_per
    # every valid edge's remap resolves to the right global row
    for shard in range(8):
        lo = shard * rows_per
        for r in range(lo, lo + rows_per):
            for a in range(idx.shape[1]):
                if w[r, a] <= 0:
                    continue
                j = int(idx[r, a])
                m = int(plan.remap[r, a])
                if m < rows_per:
                    assert lo + m == j
                else:
                    src, slot = divmod(m - rows_per, plan.r_max)
                    assert plan.send_valid[src, shard, slot]
                    assert src * rows_per + int(plan.send_map[src, shard, slot]) == j


def test_halo_solve_matches_single_device():
    Y_host = _clustered(512, 24, seed=1)
    order = pca_bisection_order(Y_host, levels=3)
    (Y_host,) = apply_order(order, Y_host)[:1]
    rng = np.random.default_rng(2)
    psi = jnp.asarray(rng.standard_normal(24).astype(np.float32))
    Y = jnp.asarray(Y_host)
    B = jnp.ones(512, dtype=jnp.float32)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)

    g = jax.jit(lambda Y: build_graph(Y, 6))(Y)
    U_ref, it_ref, _ = jax.jit(
        lambda: solve_stationary(g, None, Y, psi, B, lam, tol=1e-6, max_iters=200)
    )()

    plan = build_halo_plan(np.asarray(g.idx), np.asarray(g.w), 8)
    mesh = lattice_mesh(8)
    U_halo, it_h, res_h = halo_solve(
        mesh, g, plan, Y, psi, B, lam, tol=1e-6, max_iters=200
    )
    np.testing.assert_allclose(
        np.asarray(U_halo), np.asarray(U_ref), rtol=3e-4, atol=3e-4
    )
    assert float(res_h) <= 1e-5
    assert abs(int(it_h) - int(it_ref)) <= 1
    # the plan's halo should be far smaller than the all-gather volume
    assert plan.r_max * 8 < 512 - plan.rows_per


def test_solve_auto_picks_tiers():
    from oscillink_tpu.models.coherence import EnergyParams
    from oscillink_tpu.parallel.halo_cg import solve_auto

    mesh = lattice_mesh(8)
    rng = np.random.default_rng(5)

    # clustered -> halo tier; result matches the direct solve in ORIGINAL order
    Yc = _clustered(512, 24, seed=5)
    psi = rng.standard_normal(24).astype(np.float32)
    U, info = solve_auto(mesh, Yc, psi, k=6, tol=1e-6, max_iters=200)
    assert info["tier"] == "halo-exchange"
    assert info["res"] <= 1e-5

    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)
    g = jax.jit(lambda Y: build_graph(Y, 6))(jnp.asarray(Yc))
    U_ref, _, _ = jax.jit(
        lambda: solve_stationary(
            g, None, jnp.asarray(Yc), jnp.asarray(psi),
            jnp.ones(512, dtype=jnp.float32), lam, tol=1e-6, max_iters=200,
        )
    )()
    np.testing.assert_allclose(U, np.asarray(U_ref), rtol=3e-4, atol=3e-4)

    # isotropic high-D random data: the tier decision must be consistent
    # with the measured halo, and high-D randomness should defeat locality
    rng2 = np.random.default_rng(6)
    Yr = rng2.standard_normal((512, 128)).astype(np.float32)
    psi_r = rng2.standard_normal(128).astype(np.float32)
    _, info_r = solve_auto(mesh, Yr, psi_r, k=6, tol=1e-4, max_iters=50)
    s = info_r["halo_stats"]
    expected = (
        "halo-exchange" if s["halo_mean"] < 0.5 * s["allgather_rows"] else "all-gather"
    )
    assert info_r["tier"] == expected
    assert s["halo_fraction_mean"] > 0.5  # random high-D: halo stays large


def test_halo_solve_windowed_matches_halo_solve():
    """The windowed local matvec inside the halo tier reproduces the gather
    halo solve (per-shard window plans + in-shard Pallas kernel)."""
    from oscillink_tpu.parallel.halo_cg import (
        build_shard_window_plans,
        halo_solve_windowed,
    )

    n, d, n_dev = 8192, 24, 8
    Y_host = _clustered(n, d, seed=3)
    order = pca_bisection_order(Y_host, levels=4)
    (Y_host,) = apply_order(order, Y_host)[:1]
    rng = np.random.default_rng(4)
    psi = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    Y = jnp.asarray(Y_host)
    B = jnp.ones(n, dtype=jnp.float32)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)

    g = jax.jit(lambda Y: build_graph(Y, 6))(Y)
    plan = build_halo_plan(np.asarray(g.idx), np.asarray(g.w), n_dev)
    wplan, woh, cov, s_max = build_shard_window_plans(
        plan, np.asarray(g.wn), n_dev
    )
    assert 0.0 <= cov <= 1.0 and s_max >= 128
    # DMA bound with the SHARED s_max: every shard's straggler arrays must
    # cover [strag_off[b-1], strag_off[b-1] + s_max) — each shard's own
    # tail slack only guarantees its own plan_s_max (review finding)
    off_last = np.asarray(wplan.strag_off)[:, -1]
    assert (off_last + s_max <= wplan.strag_w.shape[1]).all()

    mesh = lattice_mesh(n_dev)
    U_ref, it_ref, res_ref = halo_solve(
        mesh, g, plan, Y, psi, B, lam, tol=1e-6, max_iters=200
    )
    U_win, it_win, res_win = halo_solve_windowed(
        mesh, g, plan, wplan, woh, Y, psi, B, lam, tol=1e-6, max_iters=200
    )
    scale = np.abs(np.asarray(U_ref)).max()
    assert np.abs(np.asarray(U_win) - np.asarray(U_ref)).max() / scale < 5e-4
    assert float(res_win) <= 1e-5
    assert abs(int(it_win) - int(it_ref)) <= 1


def test_halo_solve_bf16_gather_matches_f32():
    """Opt-in bf16 neighbor gathers (the isotropic-fallback budget lever):
    solution must match the f32 tier to ~1e-3 and solve_auto must label the
    tier when OSCILLINK_GATHER_DTYPE=bfloat16."""
    import os

    import numpy as np

    import jax.numpy as jnp

    from oscillink_tpu.models.coherence import EnergyParams
    from oscillink_tpu.parallel.halo_cg import build_halo_plan, halo_solve
    from oscillink_tpu.parallel.sharded_build import build_graph_sharded

    mesh8 = lattice_mesh(8)
    rng = np.random.default_rng(0)
    n, d, k = 2048, 32, 6
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = rng.standard_normal(d).astype(np.float32)
    B = np.ones(n, dtype=np.float32)

    g = build_graph_sharded(mesh8, jnp.asarray(Y), k)
    import jax

    idx_h, w_h = (np.asarray(a) for a in jax.device_get([g.idx, g.w]))
    plan = build_halo_plan(idx_h, w_h, 8)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)

    U32, it32, _ = halo_solve(
        mesh8, g, plan, jnp.asarray(Y), jnp.asarray(psi), jnp.asarray(B), lam,
        tol=1e-4, max_iters=48,
    )
    U16, it16, _ = halo_solve(
        mesh8, g, plan, jnp.asarray(Y), jnp.asarray(psi), jnp.asarray(B), lam,
        tol=1e-4, max_iters=48, gather_dtype="bfloat16",
    )
    rel = float(
        jnp.linalg.norm(U16 - U32) / (jnp.linalg.norm(U32) + 1e-12)
    )
    assert rel < 2e-3, rel


def test_solve_auto_bf16_tier_label(monkeypatch):
    import numpy as np

    from oscillink_tpu.parallel.halo_cg import solve_auto

    mesh8 = lattice_mesh(8)
    monkeypatch.setenv("OSCILLINK_GATHER_DTYPE", "bfloat16")
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "0")  # force gather path
    rng = np.random.default_rng(1)
    # clustered rows so the halo tier is selected
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 4
    Y = np.concatenate(
        [c + 0.3 * rng.standard_normal((256, 16)).astype(np.float32) for c in centers]
    )
    psi = rng.standard_normal(16).astype(np.float32)
    U, info = solve_auto(mesh8, Y, psi, k=6, tol=1e-3, max_iters=24)
    if info["tier"].startswith("halo-exchange"):
        assert info["tier"] == "halo-exchange-bf16gather"
    assert np.isfinite(U).all()


def test_halo_solve_windowed_dma16_tier(monkeypatch):
    """OSCILLINK_WINDOW_PRECISION=dma16 flows through the halo windowed
    tier: per-shard one-hots are cast to bf16 at build and the solve stays
    within the bf16-quantization band of the f32-stored solve."""
    from oscillink_tpu.parallel.halo_cg import (
        build_shard_window_plans,
        halo_solve_windowed,
    )

    n, d, n_dev = 8192, 24, 8
    Y_host = _clustered(n, d, seed=3)
    order = pca_bisection_order(Y_host, levels=4)
    (Y_host,) = apply_order(order, Y_host)[:1]
    rng = np.random.default_rng(4)
    psi = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    Y = jnp.asarray(Y_host)
    B = jnp.ones(n, dtype=jnp.float32)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)

    g = jax.jit(lambda Y: build_graph(Y, 6))(Y)
    plan = build_halo_plan(np.asarray(g.idx), np.asarray(g.w), n_dev)

    wplan, woh, _cov, _s_max = build_shard_window_plans(
        plan, np.asarray(g.wn), n_dev
    )
    mesh = lattice_mesh(n_dev)
    U_ref, _it, _res = halo_solve_windowed(
        mesh, g, plan, wplan, woh, Y, psi, B, lam, tol=1e-6, max_iters=200
    )

    monkeypatch.setenv("OSCILLINK_WINDOW_PRECISION", "dma16")
    wplan16, woh16, _cov2, _s2 = build_shard_window_plans(
        plan, np.asarray(g.wn), n_dev
    )
    assert woh16.main.dtype == jnp.bfloat16
    U_16, _it2, res_16 = halo_solve_windowed(
        mesh, g, plan, wplan16, woh16, Y, psi, B, lam, tol=1e-6, max_iters=200
    )
    assert float(res_16) <= 1e-5
    scale = np.abs(np.asarray(U_ref)).max()
    assert np.abs(np.asarray(U_16) - np.asarray(U_ref)).max() / scale < 5e-3
