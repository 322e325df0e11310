

def test_sparse_export_kicks_in_above_dense_limit_and_roundtrips():
    """N > _DENSE_EXPORT_LIMIT must export the k-sparse pair list, never a
    dense N x N JSON blob, and round-trip exactly (VERDICT r1 item 10)."""
    import numpy as np

    from oscillink_tpu.core.lattice import _DENSE_EXPORT_LIMIT, OscillinkLattice

    n = _DENSE_EXPORT_LIMIT + 64
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((n, 12)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=4)
    lat.set_query(rng.standard_normal(12).astype(np.float32))

    state = lat.export_state()
    assert "A" not in state
    assert "A_sparse" in state

    lat2 = OscillinkLattice.from_state(state)
    assert lat2.N == n
    r1, r2 = lat.receipt(), lat2.receipt()
    assert np.isclose(r1["deltaH_total"], r2["deltaH_total"], rtol=1e-5)
