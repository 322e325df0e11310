"""Native C++ engine: build, parity vs the dense oracle and the JAX path."""

import time

import numpy as np
import pytest

from oscillink_tpu.native import NativeEngine, native_available
from oscillink_tpu.oracle.reference import DenseOracle, laplacian_dense

pytestmark = pytest.mark.skipif(not native_available(), reason="native build unavailable")


def _data(n=48, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((n, d)).astype(np.float32),
        rng.standard_normal(d).astype(np.float32),
    )


def test_native_graph_matches_oracle():
    Y, _ = _data()
    eng = NativeEngine(Y, kneighbors=5)
    orc = DenseOracle(Y, k=5, deterministic_k=True)
    A_native = eng.dense_adjacency()
    np.testing.assert_allclose(A_native, orc.A, rtol=1e-4, atol=1e-5)
    assert np.array_equal(A_native > 0, orc.A > 0)


def test_native_graph_matches_oracle_blas_path():
    """n > 192 routes through osc_build_graph_from_sims (BLAS sims + C++
    threshold-skip top-k); same oracle contract must hold there."""
    Y, _ = _data(n=400, d=24, seed=3)
    eng = NativeEngine(Y, kneighbors=6)
    orc = DenseOracle(Y, k=6, deterministic_k=True)
    A_native = eng.dense_adjacency()
    np.testing.assert_allclose(A_native, orc.A, rtol=1e-4, atol=1e-5)
    assert np.array_equal(A_native > 0, orc.A > 0)


def test_native_topk_tie_break_matches_oracle():
    """Duplicate-heavy rows (quantized coordinates -> exact sim ties) must
    pick the lowest-index neighbor first, like the reference's
    deterministic lexsort (graph.py:44-52)."""
    rng = np.random.default_rng(7)
    # coarse quantization forces many identical cosine similarities
    Y = (rng.integers(-1, 2, size=(300, 8))).astype(np.float32)
    Y[Y.sum(axis=1) == 0, 0] = 1.0  # avoid zero rows
    eng = NativeEngine(Y, kneighbors=4)
    orc = DenseOracle(Y, k=4, deterministic_k=True)
    np.testing.assert_allclose(eng.dense_adjacency(), orc.A, rtol=1e-4, atol=1e-5)


def test_native_ustar_matches_oracle():
    Y, psi = _data(seed=1)
    eng = NativeEngine(Y, kneighbors=5)
    eng.set_query(psi)
    U_native, iters, res = eng.solve_ustar(tol=1e-6, max_iters=200)
    assert res < 1e-5

    orc = DenseOracle(Y, k=5, deterministic_k=True)
    orc.set_query(psi)
    orc.A = eng.dense_adjacency()
    orc.L, orc.sqrt_deg = laplacian_dense(orc.A)
    U_orc, _, _ = orc.solve_ustar(tol=1e-6, max_iters=200)
    np.testing.assert_allclose(U_native, U_orc, rtol=2e-4, atol=2e-4)


def test_native_settle_and_deltaH():
    Y, psi = _data(seed=2)
    eng = NativeEngine(Y, kneighbors=4)
    eng.set_query(psi)
    stats = eng.settle(max_iters=30, tol=1e-5)
    assert stats["res"] <= 1e-5 and stats["iters"] >= 1
    Ustar, _, _ = eng.solve_ustar(tol=1e-6, max_iters=200)
    dH = eng.deltaH(eng.U, Ustar)
    assert dH >= -1e-3  # energy-descent invariant


def test_native_matches_jax_lattice():
    from oscillink_tpu import OscillinkLattice

    Y, psi = _data(n=40, d=12, seed=3)
    eng = NativeEngine(Y, kneighbors=4)
    eng.set_query(psi)
    lat = OscillinkLattice(Y, kneighbors=4, deterministic_k=True)
    lat.set_query(psi)
    np.testing.assert_array_equal(eng.idx * (eng.w > 0), np.asarray(lat.graph.idx) * (np.asarray(lat.graph.w) > 0))
    U_native, _, _ = eng.solve_ustar(tol=1e-6, max_iters=200)
    U_jax = lat.solve_Ustar(tol=1e-6, max_iters=200)
    np.testing.assert_allclose(U_native, U_jax, rtol=3e-4, atol=3e-4)


def test_native_chain_matches_jax():
    from oscillink_tpu import OscillinkLattice

    Y, psi = _data(n=40, d=12, seed=5)
    chain = [1, 4, 7, 9]
    eng = NativeEngine(Y, kneighbors=4)
    eng.set_query(psi)
    eng.add_chain(chain, lamP=0.3)
    U_native, it_n, res_n = eng.solve_ustar(tol=1e-6, max_iters=200)
    assert res_n <= 1e-5

    lat = OscillinkLattice(Y, kneighbors=4, deterministic_k=True)
    lat.set_query(psi)
    lat.add_chain(chain, lamP=0.3)
    U_jax = lat.solve_Ustar(tol=1e-6, max_iters=200)
    np.testing.assert_allclose(U_native, U_jax, rtol=3e-4, atol=3e-4)
    # clear_chain restores the chain-free solution
    eng.clear_chain()
    U_nc, _, _ = eng.solve_ustar(tol=1e-6, max_iters=200)
    lat.clear_chain()
    np.testing.assert_allclose(
        U_nc, lat.solve_Ustar(tol=1e-6, max_iters=200), rtol=3e-4, atol=3e-4
    )


def test_native_speed_small_n():
    Y, psi = _data(n=128, d=64, seed=4)
    eng = NativeEngine(Y, kneighbors=6)  # warm (graph built in ctor)
    t0 = time.perf_counter()
    eng2 = NativeEngine(Y, kneighbors=6)
    eng2.set_query(psi)
    eng2.settle(max_iters=12, tol=1e-3)
    ms = 1000 * (time.perf_counter() - t0)
    assert ms < 250.0  # small-N E2E stays well under accelerator RPC latency


def test_ustar_cache_and_invalidation():
    """solve_ustar/per_node cache across receipt+bundle (three CG solves per
    serving request without it) and invalidate on any state change."""
    import numpy as np

    from oscillink_tpu.native.engine import NativeEngine

    rng = np.random.default_rng(3)
    Y = rng.standard_normal((80, 16)).astype(np.float32)
    psi = (Y[:8].mean(0) / np.linalg.norm(Y[:8].mean(0))).astype(np.float32)
    eng = NativeEngine(Y, kneighbors=4)
    eng.set_query(psi)
    U1, i1, r1 = eng.solve_ustar()
    U2, i2, r2 = eng.solve_ustar()
    assert U2 is U1 and (i2, r2) == (i1, r1)  # cache hit returns same buffer
    pn1 = eng.per_node(U1)
    assert eng.per_node(U2)[0] is pn1[0]  # per-node cached on the same U*
    # a different query must invalidate both caches
    psi2 = (Y[-8:].mean(0) / np.linalg.norm(Y[-8:].mean(0))).astype(np.float32)
    eng.set_query(psi2)
    U3, _, _ = eng.solve_ustar()
    assert U3 is not U1
    assert not np.allclose(U3, U1)
    # chain add/clear invalidates too
    eng.add_chain([0, 1, 2], lamP=0.2)
    U4, _, _ = eng.solve_ustar()
    assert U4 is not U3
    eng.clear_chain()
    U5, _, _ = eng.solve_ustar()
    assert U5 is not U4
    np.testing.assert_allclose(U5, U3, rtol=1e-5, atol=1e-6)
    # use_cache=False bypasses without clobbering correctness
    U6, _, _ = eng.solve_ustar(use_cache=False)
    np.testing.assert_allclose(U6, U5, rtol=1e-6)


def test_cached_ustar_is_frozen():
    """Review fix: the cached U* buffer is shared across callers; in-place
    mutation must raise instead of silently corrupting later receipts."""
    import numpy as np
    import pytest

    from oscillink_tpu.native.engine import NativeEngine

    rng = np.random.default_rng(4)
    Y = rng.standard_normal((40, 8)).astype(np.float32)
    eng = NativeEngine(Y, kneighbors=3)
    eng.set_query((Y[0] / np.linalg.norm(Y[0])).astype(np.float32))
    U, _, _ = eng.solve_ustar()
    with pytest.raises(ValueError):
        U[0, 0] = 99.0
    # uncached solves stay writable (fresh private buffer)
    U2, _, _ = eng.solve_ustar(use_cache=False)
    U2[0, 0] = 99.0


def test_native_diffusion_gates_match_jax():
    """The C engine's screened-Poisson gate solve (osc_diffusion_solve)
    must match the JAX preprocessor over the same graph to float epsilon
    (same build contract -> identical graphs; same CG contract)."""
    from oscillink_tpu import OscillinkLattice

    for seed, (n, d, k) in enumerate(((60, 16, 4), (200, 24, 6))):
        Y, psi = _data(n=n, d=d, seed=seed)
        psi = (psi / (np.linalg.norm(psi) + 1e-12)).astype(np.float32)
        eng = NativeEngine(Y, kneighbors=k)
        eng.set_query(psi)
        h_native = eng.diffusion_gates(beta=1.3, gamma=0.15, tol=1e-5, max_iters=512)
        lat = OscillinkLattice(Y, kneighbors=k, deterministic_k=True)
        lat.set_query(psi)
        h_jax = lat.diffusion_gates(beta=1.3, gamma=0.15, tol=1e-5, max_iters=512)
        assert h_native.shape == (n,)
        assert float(np.abs(h_native - h_jax).max()) < 5e-4
        assert h_native.min() >= 0.0 and h_native.max() <= 1.0
        # apply=True installs the gates and invalidates caches
        eng.diffusion_gates(beta=1.3, gamma=0.15, tol=1e-5, max_iters=512, apply=True)
        assert np.allclose(eng.B, h_native, atol=1e-6)


def test_native_diffusion_gates_validation():
    Y, psi = _data(n=30, d=8, seed=9)
    eng = NativeEngine(Y, kneighbors=3)
    eng.set_query(psi)
    with pytest.raises(ValueError):
        eng.diffusion_gates(gamma=0.0)
    with pytest.raises(ValueError):
        eng.diffusion_gates(psi=np.zeros(5, np.float32))


def test_native_chain_receipt_matches_jax():
    """engine.chain_receipt mirrors ops/receipts.py:chain_edge_stats; the
    chain walks REAL mutual edges so residuals/gains are nonzero."""
    from oscillink_tpu import OscillinkLattice

    rng = np.random.default_rng(0)
    n, d, k = 80, 16, 5
    centers = rng.standard_normal((4, d)).astype(np.float32)
    Y = (centers[np.arange(n) % 4] + 0.3 * rng.standard_normal((n, d))).astype(
        np.float32
    )
    psi = (Y[0] / np.linalg.norm(Y[0])).astype(np.float32)
    eng = NativeEngine(Y, kneighbors=k)
    eng.set_query(psi)
    deg = (eng.w > 0).sum(1)
    chain = [int(np.argmax(deg))]
    for _ in range(3):
        i = chain[-1]
        js = [
            int(j)
            for a, j in enumerate(eng.idx[i])
            if eng.w[i, a] > 0 and int(j) not in chain
        ]
        if not js:
            break
        chain.append(js[0])
    assert len(chain) >= 2

    cr_n = eng.chain_receipt(chain)
    lat = OscillinkLattice(Y, kneighbors=k, deterministic_k=True)
    lat.set_query(psi)
    cr_d = lat.chain_receipt(chain)
    assert cr_n["verdict"] == cr_d["verdict"]
    assert cr_n["weakest_link"]["edge"] == cr_d["weakest_link"]["edge"]
    for en, ed in zip(cr_n["edges"], cr_d["edges"]):
        for f in ("z_struct", "z_path", "r_struct", "r_path"):
            assert abs(en[f] - ed[f]) <= max(2e-3, 2e-3 * abs(ed[f])), (f, en, ed)
    assert cr_d["coherence_gain"] != 0.0
    rel = abs(cr_n["coherence_gain"] - cr_d["coherence_gain"]) / (
        abs(cr_d["coherence_gain"]) + 1e-9
    )
    assert rel < 5e-3


def test_native_chain_receipt_validation():
    Y, psi = _data(n=30, d=8, seed=2)
    eng = NativeEngine(Y, kneighbors=3)
    eng.set_query(psi)
    with pytest.raises(ValueError):
        eng.chain_receipt([1])
    with pytest.raises(ValueError):
        eng.chain_receipt([0, 99])


def test_native_chain_receipt_mismatched_chain_matches_jax():
    """Contract pin (ADVICE r4): when a chain is INSTALLED, chain_receipt
    uses the installed path graph even for a DIFFERENT queried chain —
    both backends (core/lattice.py: ``pg = self._path if ... else``;
    native/engine.py mirrors it)."""
    from oscillink_tpu import OscillinkLattice

    rng = np.random.default_rng(4)
    n, d, k = 60, 12, 5
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = (Y[0] / np.linalg.norm(Y[0])).astype(np.float32)
    installed = [0, 3, 7, 11]
    queried = [2, 5, 9]  # different from the installed chain

    eng = NativeEngine(Y, kneighbors=k)
    eng.set_query(psi)
    eng.add_chain(installed, lamP=0.2)
    cr_n = eng.chain_receipt(queried)

    lat = OscillinkLattice(Y, kneighbors=k, deterministic_k=True)
    lat.set_query(psi)
    lat.add_chain(installed, lamP=0.2)
    cr_d = lat.chain_receipt(queried)

    assert cr_n["verdict"] == cr_d["verdict"]
    for en, ed in zip(cr_n["edges"], cr_d["edges"]):
        for f in ("z_struct", "z_path", "r_struct", "r_path"):
            assert abs(en[f] - ed[f]) <= max(3e-3, 3e-3 * abs(ed[f])), (f, en, ed)
