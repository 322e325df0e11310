"""Row-blocked edge-distance path: full receipts at 500k-1M depend on
`_edge_sq_dists` never materializing the [N, K, D] gathered temp (24 GB at
1M x 8 x 768).  The blocked variant must agree with the direct one to float
noise, including on ragged N, and the downstream diagnostics (coherence
drop, null points) must be unaffected."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oscillink_tpu.ops import receipts as R
from oscillink_tpu.ops.graph import build_graph


@pytest.fixture()
def small_blocks(monkeypatch):
    """Force the blocked path at test sizes."""
    monkeypatch.setattr(R, "_EDGE_TEMP_BUDGET_BYTES", 1)
    monkeypatch.setattr(R, "_EDGE_BLOCK_ROWS", 512)


def _graph(n, d, k, seed=0):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    g = jax.jit(lambda Y: build_graph(Y, k))(jnp.asarray(Y))
    X = rng.standard_normal((n, d)).astype(np.float32)
    return g, jnp.asarray(Y), jnp.asarray(X)


def _direct(g, Xn):
    diff = Xn[:, None, :] - jnp.take(Xn, g.idx, axis=0)
    return jnp.sum(diff * diff, axis=-1)


@pytest.mark.parametrize("n", [2048, 1537])  # divisible and ragged
def test_blocked_matches_direct(small_blocks, n):
    g, _, X = _graph(n, 24, 5)
    got = jax.jit(lambda X: R._edge_sq_dists(g, X))(X)
    want = _direct(g, X)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_diagnostics_unchanged_by_blocking(monkeypatch):
    g, Y, X = _graph(1200, 16, 4)
    lamC = jnp.float32(0.5)

    coh_direct = np.asarray(R.coherence_drop(g, Y, X, lamC))
    nulls_direct = [np.asarray(a) for a in R.null_points_sparse(g, X, lamC)]

    monkeypatch.setattr(R, "_EDGE_TEMP_BUDGET_BYTES", 1)
    monkeypatch.setattr(R, "_EDGE_BLOCK_ROWS", 256)
    coh_blocked = np.asarray(R.coherence_drop(g, Y, X, lamC))
    nulls_blocked = [np.asarray(a) for a in R.null_points_sparse(g, X, lamC)]

    np.testing.assert_allclose(coh_blocked, coh_direct, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(nulls_blocked[0], nulls_direct[0])  # flags
    np.testing.assert_array_equal(nulls_blocked[1], nulls_direct[1])  # argmax j
    np.testing.assert_allclose(nulls_blocked[2], nulls_direct[2], rtol=1e-4,
                               atol=1e-5)


def test_receipt_full_chunked_matches_unchunked(monkeypatch):
    """The column-chunked receipt program (HBM-limit routing) must agree
    with the full-width one to float noise."""
    import os

    from oscillink_tpu.core.lattice import OscillinkLattice

    rng = np.random.default_rng(3)
    Y = rng.standard_normal((600, 32)).astype(np.float32)
    psi = rng.standard_normal(32).astype(np.float32)

    def run():
        lat = OscillinkLattice(Y, kneighbors=5)
        lat.set_query(psi)
        lat.settle(max_iters=10, tol=1e-3)
        return lat.receipt()

    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "1")
    r_full = run()
    monkeypatch.setenv("OSCILLINK_COL_CHUNKS", "4")
    r_chunk = run()
    assert r_chunk["deltaH_total"] == pytest.approx(
        r_full["deltaH_total"], rel=1e-5
    )
    for k in ("coh_drop_sum", "anchor_pen_sum", "query_term_sum"):
        assert r_chunk[k] == pytest.approx(r_full[k], rel=1e-4, abs=1e-4)
    assert len(r_chunk["null_points"]) == len(r_full["null_points"])


def test_device_capped_nulls_match_host_capping(monkeypatch):
    """With OSCILLINK_RECEIPT_NULL_CAP set, the top-z selection happens on
    device (only [cap] rows fetched); the kept set must equal the host-side
    sort-and-trim of the uncapped list."""
    from oscillink_tpu.core.lattice import OscillinkLattice

    rng = np.random.default_rng(9)
    Y = rng.standard_normal((300, 24)).astype(np.float32)
    psi = rng.standard_normal(24).astype(np.float32)

    def run():
        lat = OscillinkLattice(Y, kneighbors=5)
        lat.set_query(psi)
        lat.settle(max_iters=10, tol=1e-3)
        return lat.receipt()

    monkeypatch.delenv("OSCILLINK_RECEIPT_NULL_CAP", raising=False)
    r_all = run()
    monkeypatch.setenv("OSCILLINK_RECEIPT_NULL_CAP", "5")
    r_cap = run()

    want = sorted(r_all["null_points"], key=lambda e: e["z"], reverse=True)[:5]
    got = r_cap["null_points"]
    assert len(got) == min(5, len(r_all["null_points"]))
    assert {tuple(e["edge"]) for e in got} == {tuple(e["edge"]) for e in want}
    meta = r_cap["meta"]["null_points_summary"]
    assert meta["total_null_points"] == len(r_all["null_points"])
    assert meta["null_cap_applied"] == (len(r_all["null_points"]) > 5)
