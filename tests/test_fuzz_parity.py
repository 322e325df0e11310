"""Randomized configuration sweep: the sparse TPU path vs the dense oracle.

Property-style hardening of the §5.2 determinism story: for a spread of
random (N, D, k, lambda, gate, chain) configurations, the end-to-end
pipeline — graph, settle, U*, ΔH, per-node sums, bundle order — must track
the dense NumPy oracle.  Seeds are fixed; every case is reproducible.
"""

import numpy as np
import pytest

from oscillink_tpu.core.lattice import OscillinkLattice
from oscillink_tpu.oracle.reference import DenseOracle, laplacian_dense

CASES = [
    # (seed, n, d, k, lamG, lamC, lamQ, use_gates, chain_len)
    (0, 24, 6, 3, 1.0, 0.5, 4.0, False, 0),
    (1, 48, 16, 5, 0.7, 0.9, 2.0, True, 0),
    (2, 80, 12, 7, 1.5, 0.2, 6.0, False, 4),
    (3, 33, 9, 4, 1.0, 1.2, 0.5, True, 3),
    (4, 100, 24, 6, 0.4, 0.5, 4.0, True, 6),
    (5, 64, 32, 2, 1.0, 0.05, 1.0, False, 0),
    (6, 17, 5, 8, 2.0, 0.8, 3.0, True, 0),  # k clamps to N-1
]


@pytest.mark.parametrize("case", CASES, ids=[f"cfg{c[0]}" for c in CASES])
def test_random_config_parity(case):
    seed, n, d, k, lamG, lamC, lamQ, use_gates, chain_len = case
    rng = np.random.default_rng(100 + seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = rng.standard_normal(d).astype(np.float32)
    gates = (
        rng.uniform(0.1, 1.0, size=n).astype(np.float32) if use_gates else None
    )
    chain = (
        list(rng.choice(n, size=chain_len, replace=False).astype(int))
        if chain_len
        else None
    )

    lat = OscillinkLattice(
        Y, kneighbors=k, deterministic_k=True, lamG=lamG, lamC=lamC, lamQ=lamQ
    )
    lat.set_query(psi, gates=gates)
    orc = DenseOracle(
        Y, k=min(k, n - 1), deterministic_k=True, lamG=lamG, lamC=lamC, lamQ=lamQ
    )
    orc.set_query(psi, gates=gates)
    # identical adjacency isolates solver/receipt parity from top-k float ties
    orc.A = lat.dense_adjacency()
    orc.L, orc.sqrt_deg = laplacian_dense(orc.A)
    if chain:
        lat.add_chain(chain, lamP=0.3)
        orc.add_chain(chain, lamP=0.3)

    lat.settle(dt=1.0, max_iters=40, tol=1e-6)
    orc.settle(dt=1.0, max_iters=40, tol=1e-6)
    scale = max(1.0, float(np.abs(orc.U).max()))
    assert np.abs(lat.U - orc.U).max() / scale < 5e-4, "settle diverged"

    U_tpu = lat.solve_Ustar(tol=1e-6, max_iters=300)
    U_orc, _, _ = orc.solve_ustar(tol=1e-6, max_iters=300)
    assert np.abs(U_tpu - U_orc).max() / scale < 5e-4, "U* diverged"

    rec = lat.receipt()
    orc.U = lat.U.copy()
    dH_orc = orc.deltaH(orc.U, U_orc)
    assert abs(rec["deltaH_total"] - dH_orc) <= max(2e-3, 2e-3 * abs(dH_orc))

    coh, anchor, query = orc.per_node(U_orc)
    for got, want in (
        (rec["coh_drop_sum"], coh.sum()),
        (rec["anchor_pen_sum"], anchor.sum()),
        (rec["query_term_sum"], query.sum()),
    ):
        assert abs(got - want) <= max(2e-3, 2e-3 * abs(want))

    # SPD invariant holds in every configuration
    assert rec["deltaH_total"] >= -1e-4
