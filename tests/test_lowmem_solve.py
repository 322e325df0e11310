"""Round-3 low-memory large-N solve path: row-blocked k-loop matvec regime,
gather-path chunk-count model, and the donated full-width settle.

The large-N regimes are shape-gated (they only engage above ~325k rows), so
these tests force them via the module constants / env overrides and assert
parity with the small-N unrolled path on identical inputs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import oscillink_tpu.ops.graph as og
from oscillink_tpu.core import lattice as latmod
from oscillink_tpu.core.lattice import OscillinkLattice
from oscillink_tpu.models.coherence import EnergyParams, settle_step


def _rand(n=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def _unrolled_matvec(g, X):
    acc = X
    for a in range(g.k_max):
        acc = acc - g.wn[:, a][:, None] * jnp.take(X, g.idx[:, a], axis=0)
    return acc


@pytest.mark.parametrize("rb", [8, 16, 7, 29])  # dividing and overhanging
def test_kloop_blocked_matvec_matches_unrolled(monkeypatch, rb):
    """The row-blocked k-loop regime (incl. the clamped overhang block when
    rb does not divide N) must reproduce the unrolled gather-SpMV."""
    Y = _rand(n=61, d=12, seed=3)
    g = og.build_graph(jnp.asarray(Y), 5)
    X = jnp.asarray(_rand(n=61, d=12, seed=4))
    ref = np.asarray(_unrolled_matvec(g, X))
    monkeypatch.setattr(og, "_UNROLL_TEMP_BYTES", 0)
    monkeypatch.setenv("OSCILLINK_MATVEC_RB", str(rb))
    out = np.asarray(og.lap_matvec(g, X))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def test_kloop_block_rows_bounds():
    assert og._kloop_block_rows(10**7, 768, 8) == (og._KLOOP_TEMP_BYTES // (8 * 768 * 4)) // 8 * 8
    assert og._kloop_block_rows(500, 768, 8) == 500  # capped at N
    assert og._kloop_block_rows(10**7, 16, 2) >= 1024


def test_auto_col_chunks_gather_model():
    """The 5-block (un-aliased output) working-set model: full width at
    500k (the probe-validated 486/576 ms config), chunked at 1M (full-width
    1M is compile-rejected on the 16 GB chip — probe_alias_1m)."""
    lat = OscillinkLattice(_rand(32, 8), kneighbors=4)
    lat.N, lat.D, lat._kneighbors = 1_000_000, 768, 8
    assert lat._auto_col_chunks_gather(1) == 4
    # a second resident full-width block (distinct U during settle) pushes
    # c=4 to est 14.4 — the probe-rejected config — so the model steps to 8
    assert lat._auto_col_chunks_gather(2) == 8
    lat.N = 500_000
    assert lat._auto_col_chunks_gather(1) == 1
    assert lat._auto_col_chunks_gather(2) == 1
    lat.N = 4_000_000
    assert lat._auto_col_chunks_gather(2) >= 8


def test_auto_col_chunks_gather_env_override(monkeypatch):
    lat = OscillinkLattice(_rand(32, 8), kneighbors=4)
    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "4")
    assert lat._auto_col_chunks_gather(1) == 4
    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "0")
    assert lat._auto_col_chunks_gather(1) == 1


def test_jit_settle_donated_matches_plain():
    """The donated full-width settle is the plain settle with U consumed;
    same U_plus/iters/res on identical inputs (x0=None starts from U)."""
    Y = jnp.asarray(_rand(48, 12, seed=7))
    g = og.build_graph(Y, 5)
    U = Y * 1.01
    psi = jnp.asarray(_rand(1, 12, seed=8)[0])
    B = jnp.ones(48, dtype=jnp.float32)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)
    opts = jnp.asarray([1.0, 1e-3, 12.0], dtype=jnp.float32)
    ref, it_ref, res_ref = settle_step(
        g, None, U, Y, psi, B, lam, dt=opts[0], tol=opts[1],
        max_iters=opts[2].astype(jnp.int32), x0=U, use_jacobi=True,
    )
    # donate a copy (the donated buffer is invalidated on backends that
    # implement donation; CPU only warns)
    out, it, res = latmod._jit_settle_donated(
        g, None, U + 0.0, Y, psi, B, lam, opts, None, True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)
    assert int(it) == int(it_ref)


def test_cg_solve_lowmem_matches_classic():
    """cg_solve_lowmem uses float-identical update expressions — same
    iterates, iteration count and residual as cg_solve, with and without
    the Jacobi preconditioner."""
    from oscillink_tpu.ops.solver import cg_solve, cg_solve_lowmem

    rng = np.random.default_rng(11)
    n, d = 40, 6
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = A @ A.T + n * np.eye(n, dtype=np.float32)  # SPD
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    def A_mul(X):
        return Aj @ X

    for M_diag in (None, jnp.asarray(np.diag(A))):
        x1, it1, r1 = cg_solve(A_mul, b, M_diag=M_diag, tol=1e-5, max_iters=50)
        x2, it2, r2 = cg_solve_lowmem(A_mul, b, M_diag=M_diag, tol=1e-5, max_iters=50)
        assert int(it1) == int(it2)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(float(r1), float(r2), rtol=1e-4)


def test_cg_solve_lowmem_one_d_and_min_one_iter():
    from oscillink_tpu.ops.solver import cg_solve_lowmem

    A = jnp.eye(5) * 2.0
    b = jnp.ones(5)
    x, it, res = cg_solve_lowmem(lambda v: A @ v, b, tol=1e30, max_iters=10)
    assert x.shape == (5,)
    assert int(it) == 1  # the reference contract: always >= 1 iteration


def test_pick_cg_gate():
    from oscillink_tpu.models.coherence import _pick_cg
    from oscillink_tpu.ops.solver import cg_solve, cg_solve_lowmem

    small = jnp.zeros((64, 16), dtype=jnp.float32)
    assert _pick_cg(small) is cg_solve

    class _B:  # duck-typed: only size/dtype consulted
        size = 1_000_000 * 768
        dtype = np.dtype(np.float32)

    assert _pick_cg(_B()) is cg_solve_lowmem


def test_settle_routing_prefers_full_width_when_fits(monkeypatch):
    """At small N the gather chunk model must return 1 (no chunked detour)
    and settle must leave U bound to a fresh buffer distinct from Y."""
    lat = OscillinkLattice(_rand(64, 16, seed=9), kneighbors=5)
    lat.set_query(_rand(1, 16, seed=10)[0])
    assert lat._auto_col_chunks_gather(2) == 1
    lat.settle(max_iters=4)
    assert lat._U_dev is not lat._Y_dev
    # a second settle with a distinct U still routes (donate-eligible shapes
    # are TPU-scale only; this asserts the small-N path is unchanged)
    lat.settle(max_iters=4)


def test_ustar_warmstart_env(monkeypatch):
    """OSCILLINK_USTAR_WARMSTART=1 starts the U* CG from the settled U:
    same solution within tol, no more iterations than the x0=Y contract
    (and typically fewer after a settle), default path unchanged."""
    Y = _rand(96, 24, seed=13)
    psi = (Y[:16].mean(0) / (np.linalg.norm(Y[:16].mean(0)) + 1e-12)).astype(
        np.float32
    )

    lat_ref = OscillinkLattice(Y, kneighbors=6)
    lat_ref.set_query(psi)
    lat_ref.settle(max_iters=12, tol=1e-4)
    U_ref = np.asarray(lat_ref.solve_Ustar(tol=1e-5, max_iters=64))
    it_ref = int(lat_ref.last_ustar["iters"])

    monkeypatch.setenv("OSCILLINK_USTAR_WARMSTART", "1")
    lat = OscillinkLattice(Y, kneighbors=6)
    lat.set_query(psi)
    lat.settle(max_iters=12, tol=1e-4)
    U_ws = np.asarray(lat.solve_Ustar(tol=1e-5, max_iters=64))
    it_ws = int(lat.last_ustar["iters"])

    np.testing.assert_allclose(U_ws, U_ref, rtol=5e-4, atol=5e-5)
    assert it_ws <= it_ref
    # fresh lattice (U aliases Y): the flag is a no-op, x0 stays Y
    lat2 = OscillinkLattice(Y, kneighbors=6)
    lat2.set_query(psi)
    U2 = np.asarray(lat2.solve_Ustar(tol=1e-5, max_iters=64))
    np.testing.assert_allclose(U2, U_ref, rtol=5e-4, atol=5e-5)


def test_ustar_warmstart_windowed_path(monkeypatch):
    """The warm-start env also covers the windowed solve path (forced via
    OSCILLINK_WINDOWED_MATVEC=1): same solution as the contract solve."""
    monkeypatch.setenv("OSCILLINK_WINDOWED_MATVEC", "1")
    Y = _rand(128, 32, seed=17)
    psi = (Y[:16].mean(0) / (np.linalg.norm(Y[:16].mean(0)) + 1e-12)).astype(
        np.float32
    )
    lat_ref = OscillinkLattice(Y, kneighbors=6)
    lat_ref.set_query(psi)
    lat_ref.settle(max_iters=10, tol=1e-4)
    assert lat_ref._window_ctx is not None  # the forced tier engaged
    U_ref = np.asarray(lat_ref.solve_Ustar(tol=1e-5, max_iters=64))
    it_ref = int(lat_ref.last_ustar["iters"])

    monkeypatch.setenv("OSCILLINK_USTAR_WARMSTART", "1")
    lat = OscillinkLattice(Y, kneighbors=6)
    lat.set_query(psi)
    lat.settle(max_iters=10, tol=1e-4)
    U_ws = np.asarray(lat.solve_Ustar(tol=1e-5, max_iters=64))
    np.testing.assert_allclose(U_ws, U_ref, rtol=5e-4, atol=5e-5)
    assert int(lat.last_ustar["iters"]) <= it_ref
