"""Windowed Laplacian matvec: plan construction, kernel parity, lattice path.

The Pallas kernel runs in interpret mode on the CPU test mesh; the same code
compiles through Mosaic on TPU (exercised by bench.py / benchmarks).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oscillink_tpu.ops.graph import Graph, build_graph, lap_matvec
from oscillink_tpu.ops.pallas import window_spmv as ws


def _clustered(n, d, n_centers=8, seed=0, spread=0.25):
    rng = np.random.default_rng(seed)
    centers = 4.0 * rng.standard_normal((n_centers, d)).astype(np.float32)
    lbl = np.sort(rng.integers(0, n_centers, size=n))
    return (centers[lbl] + spread * rng.standard_normal((n, d))).astype(np.float32)


def test_plan_partitions_every_live_edge():
    rng = np.random.default_rng(3)
    n, k = 700, 5
    idx = rng.integers(0, n, size=(n, k)).astype(np.int32)
    wn = (rng.random((n, k)) * 0.2).astype(np.float32)
    wn[rng.random((n, k)) < 0.3] = 0.0  # padding slots
    plan, cov = ws.build_window_plan(idx, wn, W=256, R=128)
    n_live = int((wn != 0).sum())
    n_in = int((np.asarray(plan.wnl) != 0).sum())
    n_strag = int((np.asarray(plan.strag_w) != 0).sum())
    assert n_in + n_strag == n_live
    assert cov == pytest.approx(1.0 - n_strag / n_live)
    # straggler dst list must be non-decreasing (scatter uses sorted hint)
    dst = np.asarray(plan.strag_dst)
    assert (np.diff(dst) >= 0).all()
    # local ids within window bounds wherever weights are live
    for w in range(plan.n_windows):
        il, wl = np.asarray(plan.idxl[w]), np.asarray(plan.wnl[w])
        assert il[wl != 0].min() >= 0 and il[wl != 0].max() < 256
    # strag_cnt drives the kernel's skip predicate: it must cover every
    # live entry of the block's segment (cnt==0 <=> segment empty)
    cnt = np.asarray(plan.strag_cnt)
    off = np.asarray(plan.strag_off)
    w_arr = np.asarray(plan.strag_w)
    b = plan.n_blocks
    r = plan.n_pad // b
    live_blocks = np.bincount(dst[w_arr != 0] // r, minlength=b)
    assert ((cnt > 0) == (live_blocks > 0)).all()
    assert (cnt % 8 == 0).all() and (cnt >= live_blocks).all()
    for i in range(b):  # every live entry within [off[i], off[i]+cnt[i])
        seg = np.nonzero(w_arr != 0)[0]
        seg = seg[(dst[seg] // r) == i]
        if len(seg):
            assert seg.min() >= off[i] and seg.max() < off[i] + cnt[i]


@pytest.mark.parametrize("seed,gen", [(0, "clustered"), (1, "random")])
def test_windowed_matvec_matches_xla(seed, gen):
    rng = np.random.default_rng(seed)
    n, d, k = 1500, 64, 6
    if gen == "clustered":
        Y = _clustered(n, d, seed=seed)
    else:
        Y = rng.standard_normal((n, d)).astype(np.float32)
    g = jax.jit(lambda Y: build_graph(Y, k))(jnp.asarray(Y))
    plan, cov = ws.build_window_plan(
        np.asarray(g.idx), np.asarray(g.wn), W=512, R=256
    )
    oh = ws.build_onehot(plan, 512, ws.plan_s_max(plan))
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)
    out = np.asarray(ws.lap_matvec_windowed(plan, oh, Xp, W=512, R=256))[:n]
    ref = np.asarray(lap_matvec(g, jnp.asarray(X)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel < 1e-5, (gen, cov, rel)


def test_lattice_windowed_solve_matches_default(monkeypatch):
    from oscillink_tpu.core.lattice import OscillinkLattice

    Y = _clustered(1200, 48, seed=2)
    rng = np.random.default_rng(2)
    psi = rng.standard_normal(48).astype(np.float32)

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "0")
    base = OscillinkLattice(Y, kneighbors=6)
    base.set_query(psi)
    U_ref = base.solve_Ustar(tol=1e-5, max_iters=96)
    r_ref = base.receipt()

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1")  # force at small N
    lat = OscillinkLattice(Y, kneighbors=6)
    assert lat._window_ctx is not None
    assert lat._window_coverage is not None and lat._window_coverage > 0.5
    lat.set_query(psi)
    U_win = lat.solve_Ustar(tol=1e-5, max_iters=96)
    scale = np.abs(U_ref).max()
    assert np.abs(U_win - U_ref).max() / scale < 5e-4
    r_win = lat.receipt()
    assert r_win["deltaH_total"] == pytest.approx(
        r_ref["deltaH_total"], rel=1e-3, abs=1e-3
    )
    # settle through the windowed path stays SPD-sane
    out = lat.settle(max_iters=12, tol=1e-3)
    assert out["res"] is not None


def test_lattice_windowed_chain_falls_back(monkeypatch):
    from oscillink_tpu.core.lattice import OscillinkLattice

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1")
    Y = _clustered(600, 32, seed=4)
    lat = OscillinkLattice(Y, kneighbors=4)
    assert lat._window_ctx is not None
    lat.add_chain([1, 5, 9], lamP=0.2)
    # chain prior present -> solve must route through the XLA path (no error)
    lat.set_query(np.zeros(32, dtype=np.float32))
    rec = lat.chain_receipt([1, 5, 9])
    assert "verdict" in rec


def test_auto_mode_skips_small_n(monkeypatch):
    from oscillink_tpu.core.lattice import OscillinkLattice

    monkeypatch.delenv("OSCILLINK_WINDOWED_MATVEC", raising=False)
    lat = OscillinkLattice(_clustered(300, 16, seed=5), kneighbors=4)
    assert lat._window_ctx is None


def test_auto_mode_skips_chunked_solves(monkeypatch):
    """The windowed tier pays only full-width: auto mode must skip it when
    the solve column-chunks (each chunk re-streams the one-hot per apply —
    measured losing at 500k/1M, scale_tpu.json note_round4). Forced mode
    keeps it for the chunked-path tests."""
    from oscillink_tpu.core.lattice import OscillinkLattice

    Y = _clustered(1200, 48, seed=6)
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "auto")
    monkeypatch.setenv("OSCILLINK_WINDOWED_MIN_N", "512")
    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "2")
    events: list[tuple[str, dict]] = []
    lat = OscillinkLattice(Y, kneighbors=6)
    # pin the SKIP REASON, not just the outcome: the gate must fire because
    # the solve column-chunks, logged as "col-chunked solve" (the round-4
    # 500k/1M regression was exactly this ctx engaging under chunked solves)
    lat.set_logger(lambda ev, payload: events.append((ev, payload)))
    lat.rebuild_graph(kneighbors=6)
    skip_reasons = [
        p.get("reason") for ev, p in events if ev == "window_ctx_skipped"
    ]
    assert "col-chunked solve" in skip_reasons
    assert lat._window_ctx is None

    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "1")
    lat2 = OscillinkLattice(Y, kneighbors=6)
    assert lat2._window_ctx is not None

    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "2")
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1")  # forced overrides
    lat3 = OscillinkLattice(Y, kneighbors=6)
    assert lat3._window_ctx is not None


def test_lattice_windowed_chunked_solve(monkeypatch):
    """Forced col-chunking + windowed ctx routes through the windowed
    chunked solve and matches the full-width XLA solution."""
    from oscillink_tpu.core.lattice import OscillinkLattice

    Y = _clustered(1024, 32, seed=7)
    rng = np.random.default_rng(7)
    psi = rng.standard_normal(32).astype(np.float32)

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "0")
    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "1")
    base = OscillinkLattice(Y, kneighbors=6)
    base.set_query(psi)
    U_ref = base.solve_Ustar(tol=1e-5, max_iters=96)

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1")
    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "2")
    lat = OscillinkLattice(Y, kneighbors=6)
    assert lat._window_ctx is not None
    assert lat._auto_col_chunks() == 2
    lat.set_query(psi)
    U_win = lat.solve_Ustar(tol=1e-5, max_iters=96)
    assert np.abs(U_win - U_ref).max() / np.abs(U_ref).max() < 5e-4


def test_lattice_chunked_settle_matches_full(monkeypatch):
    """Forced col-chunking routes settle through the chunked path and
    matches the full-width settle."""
    from oscillink_tpu.core.lattice import OscillinkLattice

    Y = _clustered(512, 32, seed=9)
    rng = np.random.default_rng(9)
    psi = rng.standard_normal(32).astype(np.float32)

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "0")
    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "1")
    base = OscillinkLattice(Y, kneighbors=6)
    base.set_query(psi)
    base.settle(max_iters=16, tol=1e-5)

    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "4")
    lat = OscillinkLattice(Y, kneighbors=6)
    lat.set_query(psi)
    out = lat.settle(max_iters=16, tol=1e-5)
    assert out["res"] <= 1e-4
    assert np.abs(np.asarray(lat._U_dev) - np.asarray(base._U_dev)).max() < 1e-4


@pytest.mark.parametrize("n_windows", [2, 3])
def test_windowed_matvec_n_windows(n_windows):
    """2- and 3-window plans both reproduce the XLA matvec; three windows
    strictly raise coverage on banded data."""
    rng = np.random.default_rng(5)
    n, d, k = 4096, 48, 6
    idx = ((np.arange(n)[:, None] + rng.integers(-700, 700, size=(n, k))) % n).astype(
        np.int32
    )
    wn = (rng.random((n, k)) * 0.2).astype(np.float32)
    g = Graph(idx=jnp.asarray(idx), w=jnp.asarray(wn), wn=jnp.asarray(wn),
              sqrt_deg=jnp.ones(n))
    plan, cov = ws.build_window_plan(idx, wn, W=512, R=256, n_windows=n_windows)
    assert plan.n_windows == n_windows
    oh = ws.build_onehot(plan, 512, ws.plan_s_max(plan))
    assert oh.main.shape[1] == n_windows * 512
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)
    out = np.asarray(ws.lap_matvec_windowed(plan, oh, Xp, W=512, R=256))[:n]
    ref = np.asarray(lap_matvec(g, jnp.asarray(X)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel < 1e-5, (n_windows, cov, rel)
    if n_windows == 3:
        _, cov2 = ws.build_window_plan(idx, wn, W=512, R=256, n_windows=2)
        assert cov > cov2


def test_kernel3_strag_skip_parity_interpret():
    """The in-kernel straggler path (TPU-only in production) in interpret
    mode: predicated DMA/correction must match the gather matvec with a
    mix of empty and straggler-heavy blocks."""
    from unittest import mock

    from oscillink_tpu.ops.graph import Graph, lap_matvec

    rng = np.random.default_rng(1)
    n, d, k = 4096, 256, 6
    idx = (np.arange(n)[:, None] + rng.integers(-200, 200, size=(n, k))) % n
    idx[1500:1800] = rng.integers(0, n, size=(300, k))  # far-jump band
    idx = idx.astype(np.int32)
    wn = (rng.random((n, k)) * 0.1).astype(np.float32)
    plan, _ = ws.build_window_plan(idx, wn, W=384, n_windows=3)
    cnt = np.asarray(plan.strag_cnt)
    assert (cnt == 0).any() and (cnt > 0).any()  # both kernel arms exercised
    oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)

    orig = ws.pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(ws.pl, "pallas_call", interp):
        out = np.asarray(
            ws._window_spmv3(
                plan, oh.main, oh.strag, Xp, 384,
                plan.n_pad // plan.n_blocks, oh.strag.shape[1], "bf16x3",
            )
        )[:n]
    g = Graph(
        idx=jnp.asarray(idx), w=jnp.asarray(wn), wn=jnp.asarray(wn),
        sqrt_deg=jnp.ones(n),
    )
    ref = np.asarray(lap_matvec(g, jnp.asarray(X)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel < 5e-5, rel


def test_aligned_geometry_parity_and_coverage():
    """The production R=W=384 aligned geometry (window_geometry_125k.json:
    5.21 vs 6.60 ms/apply at R=256): the first elected window is the
    diagonal block, so coverage must beat the unaligned plan on banded
    data, and the kernel must stay parity-clean — including the TPU
    straggler kernel in interpret mode."""
    from unittest import mock

    rng = np.random.default_rng(8)
    n, d, k = 4096, 128, 6
    idx = ((np.arange(n)[:, None] + rng.integers(-400, 400, size=(n, k))) % n).astype(
        np.int32
    )
    wn = (rng.random((n, k)) * 0.1).astype(np.float32)
    plan, cov = ws.build_window_plan(idx, wn, W=384, R=384, n_windows=3)
    _, cov_old = ws.build_window_plan(idx, wn, W=384, R=256, n_windows=3)
    assert cov > cov_old
    assert plan.n_pad % 384 == 0 and plan.n_pad // plan.n_blocks == 384
    oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)
    g = Graph(
        idx=jnp.asarray(idx), w=jnp.asarray(wn), wn=jnp.asarray(wn),
        sqrt_deg=jnp.ones(n),
    )
    ref = np.asarray(lap_matvec(g, jnp.asarray(X)))
    out = np.asarray(ws.lap_matvec_windowed(plan, oh, Xp, W=384, R=384))[:n]
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel < 1e-5, rel

    orig = ws.pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(ws.pl, "pallas_call", interp):
        out3 = np.asarray(
            ws._window_spmv3(
                plan, oh.main, oh.strag, Xp, 384, 384, oh.strag.shape[1],
                "bf16x3",
            )
        )[:n]
    rel3 = np.abs(out3 - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel3 < 5e-5, rel3


def test_device_plan_matches_host_plan_3w():
    """Device and host builders agree on the 3-window partition."""
    rng = np.random.default_rng(6)
    n, k = 2048, 5
    idx = ((np.arange(n)[:, None] + rng.integers(-500, 500, size=(n, k))) % n).astype(
        np.int32
    )
    wn = (rng.random((n, k)) * 0.2).astype(np.float32)
    wn[rng.random((n, k)) < 0.2] = 0.0
    order = np.arange(n, dtype=np.int32)
    cap = ((n * k // 2 + 7) // 8) * 8
    plan_d, cov_d, n_strag_d, fits = ws.build_window_plan_device(
        jnp.asarray(idx), jnp.asarray(wn), jnp.asarray(order), 512, 256, cap,
        512, 3,
    )
    plan_h, cov_h = ws.build_window_plan(idx, wn, W=512, R=256, n_windows=3)
    assert bool(fits)
    assert float(cov_d) == pytest.approx(cov_h, abs=1e-6)
    assert np.array_equal(np.asarray(plan_d.cs), np.asarray(plan_h.cs))
    assert np.array_equal(np.asarray(plan_d.wnl), np.asarray(plan_h.wnl))
    assert np.array_equal(np.asarray(plan_d.idxl), np.asarray(plan_h.idxl))
    assert np.array_equal(np.asarray(plan_d.strag_off), np.asarray(plan_h.strag_off))
    assert np.array_equal(np.asarray(plan_d.strag_cnt), np.asarray(plan_h.strag_cnt))


def test_lattice_windowed_chunked_settle(monkeypatch):
    """Windowed ctx + forced chunking routes settle through the windowed
    chunked path and matches the full-width XLA settle."""
    from oscillink_tpu.core.lattice import OscillinkLattice

    Y = _clustered(1024, 32, seed=11)
    rng = np.random.default_rng(11)
    psi = rng.standard_normal(32).astype(np.float32)

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "0")
    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "1")
    base = OscillinkLattice(Y, kneighbors=6)
    base.set_query(psi)
    base.settle(max_iters=16, tol=1e-5)

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1")
    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "2")
    lat = OscillinkLattice(Y, kneighbors=6)
    assert lat._window_ctx is not None and lat._auto_col_chunks() == 2
    lat.set_query(psi)
    out = lat.settle(max_iters=16, tol=1e-5)
    assert out["res"] <= 1e-4
    assert np.abs(np.asarray(lat._U_dev) - np.asarray(base._U_dev)).max() < 1e-4


def test_kernel3f_fused_parity_interpret():
    """The fused operator kernel (_window_spmv3f: diag fold + in-kernel
    ⟨p,Kp⟩, TPU-only in production) in interpret mode: out must equal the
    composition identity (g−1)⊙X + L_win X and pap the exact per-column
    reduction, across empty and straggler-heavy blocks (both kernel arms
    write pap)."""
    from unittest import mock

    from oscillink_tpu.ops.graph import Graph, lap_matvec

    rng = np.random.default_rng(3)
    n, d, k = 4096, 256, 6
    idx = (np.arange(n)[:, None] + rng.integers(-200, 200, size=(n, k))) % n
    idx[1500:1800] = rng.integers(0, n, size=(300, k))  # far-jump band
    idx = idx.astype(np.int32)
    wn = (rng.random((n, k)) * 0.1).astype(np.float32)
    plan, _ = ws.build_window_plan(idx, wn, W=384, n_windows=3)
    cnt = np.asarray(plan.strag_cnt)
    assert (cnt == 0).any() and (cnt > 0).any()
    oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)
    g = jnp.asarray((1.5 + rng.random(plan.n_pad)).astype(np.float32)[:, None])

    orig = ws.pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(ws.pl, "pallas_call", interp):
        out, pap = ws._window_spmv3f(
            plan, oh.main, oh.strag, Xp, g, 384,
            plan.n_pad // plan.n_blocks, oh.strag.shape[1], "bf16x3",
        )
    gr = Graph(
        idx=jnp.asarray(idx), w=jnp.asarray(wn), wn=jnp.asarray(wn),
        sqrt_deg=jnp.ones(n),
    )
    ref = np.array((g - 1.0) * Xp)
    ref[:n] += np.asarray(lap_matvec(gr, jnp.asarray(X)))
    rel = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel < 5e-5, rel
    pap_ref = (np.asarray(Xp) * ref).sum(axis=0)
    prel = np.abs(np.asarray(pap) - pap_ref).max() / (np.abs(pap_ref).max() + 1e-12)
    assert prel < 5e-4, prel


def test_oh16_tier_parity_interpret():
    """bf16-stored one-hot (oh16): operator error bounded by the bf16
    quantization of the edge weights (~2^-9 relative), and the tier name
    resolves through _env_precision."""
    rng = np.random.default_rng(3)
    n, d, k = 1500, 64, 6
    Y = _clustered(n, d, seed=3)
    g = jax.jit(lambda Y: build_graph(Y, k))(jnp.asarray(Y))
    plan, _cov = ws.build_window_plan(
        np.asarray(g.idx), np.asarray(g.wn), W=512, R=256
    )
    oh = ws.build_onehot(plan, 512, ws.plan_s_max(plan))
    oh16 = oh._replace(main=oh.main.astype(jnp.bfloat16))
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)
    out = np.asarray(
        ws.lap_matvec_windowed(plan, oh16, Xp, W=512, R=256, precision="oh16")
    )[:n]
    ref = np.asarray(lap_matvec(g, jnp.asarray(X)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel < 5e-3, rel

    import os

    old = os.environ.get("OSCILLINK_WINDOW_PRECISION")
    os.environ["OSCILLINK_WINDOW_PRECISION"] = "oh16"
    try:
        assert ws._env_precision() == "oh16"
    finally:
        if old is None:
            del os.environ["OSCILLINK_WINDOW_PRECISION"]
        else:
            os.environ["OSCILLINK_WINDOW_PRECISION"] = old


def test_lattice_oh16_ctx_and_parity(monkeypatch):
    """OSCILLINK_WINDOW_PRECISION=oh16 casts the ctx one-hot to bf16 at
    build, surfaces the tier in receipt meta, and stays within the
    bf16-weight quantization bound of the default tier."""
    from oscillink_tpu.core.lattice import OscillinkLattice

    Y = _clustered(1200, 48, seed=5)
    rng = np.random.default_rng(5)
    psi = rng.standard_normal(48).astype(np.float32)

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1")
    base = OscillinkLattice(Y, kneighbors=6)
    base.set_query(psi)
    r_ref = base.receipt()
    assert base._window_ctx.oh.main.dtype == jnp.float32

    monkeypatch.setenv("OSCILLINK_WINDOW_PRECISION", "oh16")
    lat = OscillinkLattice(Y, kneighbors=6)
    assert lat._window_ctx is not None
    assert lat._window_ctx.oh.main.dtype == jnp.bfloat16
    lat.set_query(psi)
    r16 = lat.receipt()
    assert r16["meta"]["window_precision"] == "oh16"
    assert r16["deltaH_total"] == pytest.approx(
        r_ref["deltaH_total"], rel=2e-2
    )


def test_accept_window_plan_rules():
    """The router's acceptance predicate (round 5): correctness guards are
    absolute; otherwise forced OR coverage OR the bounded-straggler rule
    (kernel cost scales with s_max, not coverage — iso_straggler_125k vs
    northstar_e2e_125k)."""
    acc = ws.accept_window_plan
    kw = dict(forced=False, min_cov=0.92, lowcov_bound=512)
    # correctness guards: truncated list / non-fitting DMA window never pass
    assert acc(0.99, 2000, True, 384, 1000, **kw) == (False, "straggler overflow")
    assert acc(0.99, 10, False, 384, 1000, **kw) == (False, "straggler overflow")
    assert acc(0.99, 2000, True, 384, 1000, forced=True, min_cov=0.92,
               lowcov_bound=512)[0] is False
    # coverage bar
    assert acc(0.95, 10, True, 384, 1000, **kw) == (True, "coverage")
    # the round-5 rule: low coverage, bounded stragglers
    assert acc(0.07, 900, True, 512, 1000, **kw) == (True, "bounded stragglers")
    # high straggler volume at low coverage: rejected
    assert acc(0.07, 900, True, 2560, 100000, **kw) == (False, "low coverage")
    # bound disabled -> coverage-only (pre-round-5 behavior)
    assert acc(0.07, 900, True, 512, 1000, forced=False, min_cov=0.92,
               lowcov_bound=0) == (False, "low coverage")
    # forced overrides coverage (but not the correctness guards above)
    assert acc(0.07, 900, True, 2560, 100000, forced=True, min_cov=0.92,
               lowcov_bound=0) == (True, "forced")


def test_lowcov_bounded_straggler_acceptance(monkeypatch):
    """A low-coverage graph whose stragglers overflow the tight first-pass
    caps is retried at the lowcov s_max bound and ACCEPTED when it fits
    (the round-5 rule); OSCILLINK_WINDOWED_LOWCOV_SMAX=0 restores the
    coverage-only gate."""
    from oscillink_tpu.core.lattice import OscillinkLattice

    Y = _clustered(1200, 48, seed=9)
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "auto")
    monkeypatch.setenv("OSCILLINK_WINDOWED_MIN_N", "512")
    # pin the bound so the test stays stable if the default moves
    monkeypatch.setenv("OSCILLINK_WINDOWED_LOWCOV_SMAX", "512")

    real_builder = ws.build_window_plan_device
    calls: list[tuple[int, int]] = []

    def fake_builder(idx, wn, order, W, R, strag_cap, s_max, n_windows):
        calls.append((s_max, strag_cap))
        plan, cov, n_strag, fits = real_builder(
            idx, wn, order, W, R, strag_cap, s_max, n_windows
        )
        if s_max == 384:
            # simulate the low-coverage regime: the tight first pass
            # overflows on every build
            return plan, jnp.float32(0.07), n_strag, jnp.bool_(False)
        return plan, jnp.float32(0.07), n_strag, fits

    monkeypatch.setattr(ws, "build_window_plan_device", fake_builder)
    events: list[tuple[str, dict]] = []
    lat = OscillinkLattice(Y, kneighbors=6)
    lat.set_logger(lambda ev, p: events.append((ev, p)))
    lat.rebuild_graph(kneighbors=6)
    accepts = [p for ev, p in events if ev == "window_ctx"]
    assert lat._window_ctx is not None
    assert len(calls) >= 2 and calls[-1][0] == 512  # retried at the bound
    assert accepts and accepts[-1]["accepted"] == "bounded stragglers"
    assert accepts[-1]["s_max"] == 512

    # the retry-accepted ctx must still solve correctly (straggler-heavy
    # plans share the kernel path; parity vs the default solve)
    rng = np.random.default_rng(9)
    psi = rng.standard_normal(48).astype(np.float32)
    lat.set_query(psi)
    r_win = lat.receipt()
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "0")
    base = OscillinkLattice(Y, kneighbors=6)
    base.set_query(psi)
    r_ref = base.receipt()
    assert r_win["deltaH_total"] == pytest.approx(
        r_ref["deltaH_total"], rel=1e-3
    )

    # bound disabled: the same low-coverage graph is rejected with the
    # coverage reason (no retry of the overflow path)
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "auto")
    monkeypatch.setenv("OSCILLINK_WINDOWED_LOWCOV_SMAX", "0")
    calls.clear()
    events.clear()
    lat0 = OscillinkLattice(Y, kneighbors=6)
    lat0.set_logger(lambda ev, p: events.append((ev, p)))
    lat0.rebuild_graph(kneighbors=6)
    assert lat0._window_ctx is None
    skips = [p for ev, p in events if ev == "window_ctx_skipped"]
    assert skips and skips[-1]["reason"] == "straggler overflow"
    assert all(c[0] == 384 for c in calls)  # bound off -> no retry


def test_dma16_tier_parity_interpret():
    """dma16 = oh16 + bf16-STORED straggler contribution buffer: operator
    error stays at the bf16 quantization grade (~2^-9 relative) on a plan
    with a substantial straggler population, and the tier name resolves
    through _env_precision."""
    rng = np.random.default_rng(11)
    n, d, k = 1500, 64, 6
    # isotropic data -> low coverage -> most edges are stragglers: the
    # bf16 contrib store is the dominant perturbation under test
    Y = rng.standard_normal((n, d)).astype(np.float32)
    g = jax.jit(lambda Y: build_graph(Y, k))(jnp.asarray(Y))
    plan, cov = ws.build_window_plan(
        np.asarray(g.idx), np.asarray(g.wn), W=512, R=256
    )
    assert cov < 0.9  # a real straggler population is exercised
    oh = ws.build_onehot(plan, 512, ws.plan_s_max(plan))
    oh16 = oh._replace(main=oh.main.astype(jnp.bfloat16))
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)
    out = np.asarray(
        ws.lap_matvec_windowed(plan, oh16, Xp, W=512, R=256, precision="dma16")
    )[:n]
    ref = np.asarray(lap_matvec(g, jnp.asarray(X)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel < 5e-3, rel

    import os

    old = os.environ.get("OSCILLINK_WINDOW_PRECISION")
    os.environ["OSCILLINK_WINDOW_PRECISION"] = "dma16"
    try:
        assert ws._env_precision() == "dma16"
    finally:
        if old is None:
            del os.environ["OSCILLINK_WINDOW_PRECISION"]
        else:
            os.environ["OSCILLINK_WINDOW_PRECISION"] = old


def test_lattice_dma16_ctx_and_parity(monkeypatch):
    """OSCILLINK_WINDOW_PRECISION=dma16 casts the ctx one-hot to bf16,
    surfaces the tier in receipt meta, and the settle stays within the
    bf16-quantization bound of the default tier."""
    from oscillink_tpu.core.lattice import OscillinkLattice

    Y = _clustered(1200, 48, seed=7)
    rng = np.random.default_rng(7)
    psi = rng.standard_normal(48).astype(np.float32)

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1")
    base = OscillinkLattice(Y, kneighbors=6)
    base.set_query(psi)
    r_ref = base.receipt()

    monkeypatch.setenv("OSCILLINK_WINDOW_PRECISION", "dma16")
    lat = OscillinkLattice(Y, kneighbors=6)
    assert lat._window_ctx is not None
    assert lat._window_ctx.oh.main.dtype == jnp.bfloat16
    lat.set_query(psi)
    r16 = lat.receipt()
    assert r16["meta"]["window_precision"] == "dma16"
    assert r16["deltaH_total"] == pytest.approx(
        r_ref["deltaH_total"], rel=2e-2
    )


def test_auto_mode_admits_fullwidth_windowed_when_fits(monkeypatch):
    """When the GATHER chunk model says chunk but the windowed solve's own
    working set fits (`_windowed_fw_est_gb` <= budget), auto mode admits
    the full-width windowed ctx — the measured 500k regime
    (fw500k_lattice.json: 376 ms full-width windowed vs 573 routed gather).
    The solve must take the FULL-WIDTH branch, not the chunked-windowed one
    (which loses, rows_round4)."""
    from oscillink_tpu.core.lattice import OscillinkLattice

    Y = _clustered(1200, 48, seed=6)
    rng = np.random.default_rng(6)
    psi = rng.standard_normal(48).astype(np.float32)

    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "auto")
    monkeypatch.setenv("OSCILLINK_WINDOWED_MIN_N", "512")
    # gather path twin for the correctness anchor
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "0")
    base = OscillinkLattice(Y, kneighbors=6)
    base.set_query(psi)
    base.settle(max_iters=12, tol=1e-3)
    r_ref = base.receipt()

    # simulate the large-N regime: the gather model chunks, but N is tiny
    # so the windowed working set trivially fits the budget
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "auto")
    monkeypatch.setattr(OscillinkLattice, "_auto_col_chunks", lambda self: 2)
    events: list[tuple[str, dict]] = []
    lat = OscillinkLattice(Y, kneighbors=6)
    assert lat._window_ctx is not None
    assert lat._window_fullwidth is True
    lat.set_query(psi)
    lat.settle(max_iters=12, tol=1e-3)
    r = lat.receipt()
    assert r["deltaH_total"] == pytest.approx(r_ref["deltaH_total"], rel=1e-3)

    # the full estimate gate: an over-budget working set must skip with its
    # own reason (never risk a ResourceExhausted full-width attempt)
    monkeypatch.setattr(
        OscillinkLattice,
        "_windowed_fw_est_gb",
        lambda self, *a, **k: 99.0,
    )
    lat2 = OscillinkLattice(Y, kneighbors=6)
    lat2.set_logger(lambda ev, p: events.append((ev, p)))
    lat2.rebuild_graph(kneighbors=6)
    reasons = [p.get("reason") for ev, p in events if ev == "window_ctx_skipped"]
    assert "fw working set" in reasons
    assert lat2._window_ctx is None


def test_fw_admission_disabled_by_env(monkeypatch):
    """OSCILLINK_WINDOWED_FW_GB=0 restores the blanket round-4 chunk gate."""
    from oscillink_tpu.core.lattice import OscillinkLattice

    Y = _clustered(1200, 48, seed=6)
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "auto")
    monkeypatch.setenv("OSCILLINK_WINDOWED_MIN_N", "512")
    monkeypatch.setenv("OSCILLINK_WINDOWED_FW_GB", "0")
    monkeypatch.setattr(OscillinkLattice, "_auto_col_chunks", lambda self: 2)
    events: list[tuple[str, dict]] = []
    lat = OscillinkLattice(Y, kneighbors=6)
    lat.set_logger(lambda ev, p: events.append((ev, p)))
    lat.rebuild_graph(kneighbors=6)
    reasons = [p.get("reason") for ev, p in events if ev == "window_ctx_skipped"]
    assert "col-chunked solve" in reasons
    assert lat._window_ctx is None
