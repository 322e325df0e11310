"""Streaming & incremental updates (parallel/streaming.py) — the implemented
version of the reference's conceptual SCALING.md:61-69 design: buffered
appends, fixed-shape micro-lattice integration, super-level-only re-solve,
delta receipts, and downward gate propagation."""

import numpy as np
import pytest

from oscillink_tpu.parallel.hierarchical import hierarchical_settle
from oscillink_tpu.parallel.streaming import StreamingLattice


def _data(n, d, seed=0):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = rng.standard_normal(d).astype(np.float32)
    psi /= np.linalg.norm(psi)
    return Y, psi


def test_append_buffers_then_autoflushes():
    Y, psi = _data(70, 16)
    sl = StreamingLattice(psi, shard_size=32, max_shards=8, kneighbors=4)
    r = sl.append(Y[:10])
    assert r == [] and sl.buffered == 10 and sl.n_shards == 0
    r = sl.append(Y[10:70])  # 70 rows total -> two flushes, 6 left buffered
    assert len(r) == 2
    assert sl.n_shards == 2 and sl.buffered == 6 and sl.total_rows == 70
    assert r[0]["new_shard"]["rows"] == 32
    assert r[1]["seq"] == 2


def test_partial_flush_padding_is_inert():
    """A partial bucket (zero-padded to shard_size) must produce the same
    shard receipt and summary as a bucket sized exactly to the rows."""
    Y, psi = _data(20, 12, seed=3)
    a = StreamingLattice(psi, shard_size=32, max_shards=4, kneighbors=4)
    a.append(Y)
    ra = a.flush()
    b = StreamingLattice(psi, shard_size=20, max_shards=4, kneighbors=4)
    b.append(Y)  # auto-flushes at exactly 20 rows
    rb = b.delta_receipt()
    sa, sb = ra["new_shard"], rb["shard_receipts"][0]
    assert sa["rows"] == sb["rows"] == 20
    np.testing.assert_allclose(sa["deltaH"], sb["deltaH"], rtol=1e-5)
    np.testing.assert_allclose(sa["align"], sb["align"], rtol=1e-5)
    np.testing.assert_allclose(a.shard_ustar(0), b.shard_ustar(0), rtol=2e-5,
                               atol=1e-6)


def test_matches_hierarchical_composition():
    """A fully-flushed streaming lattice composes the receipts the batch
    hierarchical tier produces on the same shard partition."""
    n_shards, ns, d = 4, 24, 16
    Y, psi = _data(n_shards * ns, d, seed=1)
    batch = hierarchical_settle(
        Y, psi, n_shards=n_shards, kneighbors=4, super_k=3
    )
    # same super-k clamp: min(3, max_shards-1) == min(3, n_shards-1) == 3
    sl = StreamingLattice(
        psi, shard_size=ns, max_shards=8, kneighbors=4, super_k=3
    )
    sl.append(Y)
    rec = sl.delta_receipt()
    assert rec["n_shards"] == n_shards
    for s in range(n_shards):
        np.testing.assert_allclose(
            rec["shard_receipts"][s]["deltaH"],
            batch["shard_receipts"][s]["deltaH"],
            rtol=1e-4,
        )
    np.testing.assert_allclose(
        rec["super"]["deltaH"], batch["super"]["deltaH"], rtol=1e-4
    )
    np.testing.assert_allclose(
        rec["super"]["align"], batch["super"]["align"], rtol=1e-4, atol=1e-6
    )
    assert rec["super"]["ranking"] == batch["super"]["ranking"]


def test_delta_receipts_accumulate():
    Y, psi = _data(96, 16, seed=2)
    sl = StreamingLattice(psi, shard_size=32, max_shards=8, kneighbors=4)
    receipts = sl.append(Y)  # three flushes
    assert len(receipts) == 3
    total = sum(r["deltaH_since_last"] for r in receipts)
    np.testing.assert_allclose(total, receipts[-1]["deltaH_composed"], rtol=1e-5)
    # composed deltaH is monotone under appends of coupled data here, and
    # deltaH_since_last consumes the delta
    follow = sl.delta_receipt()
    assert follow["deltaH_since_last"] == 0.0
    assert follow["composition_sig"] == receipts[-1]["composition_sig"]


def test_gate_propagation_scales_children():
    Y, psi = _data(64, 16, seed=4)
    sl = StreamingLattice(psi, shard_size=32, max_shards=4, kneighbors=4)
    gates = np.linspace(0.2, 1.0, 64).astype(np.float32)
    sl.append(Y, gates=gates)
    eff = sl.propagate_gates([1.0, 0.25])
    np.testing.assert_allclose(eff[0], gates[:32], rtol=1e-6)
    np.testing.assert_allclose(eff[1], gates[32:] * 0.25, rtol=1e-6)
    with pytest.raises(ValueError):
        sl.propagate_gates([1.0])


def test_validation_and_capacity():
    _, psi = _data(4, 8)
    sl = StreamingLattice(psi, shard_size=4, max_shards=1, kneighbors=2,
                          auto_consolidate=False)
    with pytest.raises(ValueError):
        sl.append(np.zeros((2, 5), dtype=np.float32))  # wrong dim
    with pytest.raises(ValueError):
        sl.append(np.zeros((2, 8)), gates=np.ones(3))
    sl.append(np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32))
    assert sl.n_shards == 1
    sl.append(np.zeros((1, 8), dtype=np.float32))
    with pytest.raises(RuntimeError):
        sl.flush()
    with pytest.raises(ValueError):
        StreamingLattice(psi, lamG=0.0)
    # a 1-slot table dead-ends after one flush, so auto mode rejects it
    with pytest.raises(ValueError, match="max_shards >= 2"):
        StreamingLattice(psi, shard_size=4, max_shards=1)
    # manual consolidation of a table larger than one bucket is a clear
    # error, not an np.pad crash
    sl2 = StreamingLattice(psi, shard_size=4, max_shards=6, kneighbors=2,
                           auto_consolidate=False)
    rng = np.random.default_rng(1)
    sl2.append(rng.standard_normal((4 * 6, 8)).astype(np.float32))
    with pytest.raises(RuntimeError, match="shard_size >= max_shards"):
        sl2.consolidate()


def test_component_receipt_signing():
    """SCALING.md section 6: shard + composed receipts independently
    verifiable with HMAC (both composition tiers)."""
    from oscillink_tpu.core.receipts import verify_component

    Y, psi = _data(64, 16, seed=5)
    sl = StreamingLattice(
        psi, shard_size=32, max_shards=4, kneighbors=4, receipt_secret="s3cret"
    )
    receipts = sl.append(Y)
    for r in receipts:
        assert verify_component(r, "s3cret")
        assert not verify_component(r, "wrong")
        assert verify_component(r["new_shard"], "s3cret")
    tampered = dict(receipts[-1])
    tampered["deltaH_composed"] = 0.0
    assert not verify_component(tampered, "s3cret")

    batch = hierarchical_settle(
        Y, psi, n_shards=2, kneighbors=4, receipt_secret="s3cret"
    )
    assert verify_component(batch, "s3cret")
    for r in batch["shard_receipts"]:
        assert verify_component(r, "s3cret")
        assert not verify_component(r, "wrong")


def test_tiny_bucket_k_clamp_equivalence():
    """A bucket with fewer live rows than kneighbors+1 behaves exactly like
    an exact-size lattice with k clamped to live-1 (zero-sim padded
    candidates never displace positive live edges)."""
    Y, psi = _data(3, 12, seed=7)
    a = StreamingLattice(psi, shard_size=32, max_shards=2, kneighbors=6)
    a.append(Y)
    ra = a.flush()
    b = StreamingLattice(psi, shard_size=3, max_shards=2, kneighbors=2)
    rb = b.append(Y)[0]
    np.testing.assert_allclose(
        ra["new_shard"]["deltaH"], rb["new_shard"]["deltaH"], rtol=1e-5
    )
    np.testing.assert_allclose(a.shard_ustar(0), b.shard_ustar(0), rtol=2e-5,
                               atol=1e-6)


def test_consolidation_recursion_unbounds_the_stream():
    """When the summary table fills, consolidate() collapses the shards into
    one pseudo-shard (the reference design's recursion clause) and the
    stream continues with continuous total_rows / deltaH_composed."""
    Y, psi = _data(32 * 6, 16, seed=8)
    sl = StreamingLattice(
        psi, shard_size=32, max_shards=3, kneighbors=4, receipt_secret="k"
    )
    from oscillink_tpu.core.receipts import verify_component

    r1 = sl.append(Y[: 32 * 3])  # fills the table exactly
    assert sl.n_shards == 3 and sl.generation == 0
    before = r1[-1]["deltaH_composed"]

    r2 = sl.append(Y[32 * 3 : 32 * 4])  # triggers auto-consolidation
    assert sl.generation == 1
    assert sl.n_shards == 2  # consolidated + the new shard
    assert sl.total_rows == 32 * 4
    cons = r2[0]["shard_receipts"][0]
    assert cons["consolidated"] and cons["children"] == 3
    assert cons["rows"] == 32 * 3  # logical rows absorbed
    assert r2[0]["deltaH_composed"] > before > 0
    assert verify_component(cons, "k")

    # a second consolidation stacks the recursion (the 2nd of these two
    # flushes finds the table full again)
    sl.append(Y[32 * 4 :])
    assert sl.generation == 2 and sl.n_shards == 2
    sl.append(_data(32, 16, seed=9)[0])
    assert sl.n_shards == 3 and sl.generation == 2
    assert sl.total_rows == 32 * 7

    # gates propagate per current-generation unit; the consolidated
    # pseudo-shard has no addressable children
    eff = sl.propagate_gates(np.ones(sl.n_shards, dtype=np.float32))
    assert len(eff) == sl.n_shards and eff[0].shape == (0,)


def test_consolidate_guards():
    _, psi = _data(4, 8)
    sl = StreamingLattice(psi, shard_size=8, max_shards=4, kneighbors=2)
    with pytest.raises(RuntimeError):
        sl.consolidate()  # nothing to merge
    with pytest.raises(ValueError):
        StreamingLattice(psi, shard_size=8, max_shards=16)  # table > bucket
    # opting out of auto-consolidation restores the hard error
    sl2 = StreamingLattice(
        psi, shard_size=4, max_shards=2, kneighbors=2, auto_consolidate=False
    )
    rng = np.random.default_rng(0)
    sl2.append(rng.standard_normal((8, 8)).astype(np.float32))
    sl2.append(rng.standard_normal((1, 8)).astype(np.float32))
    with pytest.raises(RuntimeError):
        sl2.flush()


def test_bundle_spans_generations():
    """bundle(k) retrieves globally (the SCALING.md API sketch's
    hl.bundle): ids from shards that were consolidated away remain
    retrievable through the bounded candidate pool."""
    rng = np.random.default_rng(11)
    d = 16
    psi = rng.standard_normal(d).astype(np.float32)
    psi /= np.linalg.norm(psi)
    # plant strongly aligned rows at known global arrival indices
    Y = rng.standard_normal((32 * 4, d)).astype(np.float32)
    planted = [3, 40, 70, 100]
    for g in planted:
        Y[g] = 5.0 * psi + 0.01 * rng.standard_normal(d).astype(np.float32)
    sl = StreamingLattice(
        psi, shard_size=32, max_shards=3, kneighbors=4, candidate_pool=8
    )
    sl.ingest(Y)  # 4 flushes -> one consolidation along the way
    assert sl.generation >= 1
    got = [e["id"] for e in sl.bundle(k=4, diversify=False)]
    assert set(got) == set(planted)
    # diversified mode returns k entries led by the top-aligned candidate
    div = sl.bundle(k=4)
    assert len(div) == 4 and div[0]["id"] == got[0]
    # receipt() peeks without consuming the delta: a direct consolidate()
    # changes the composed deltaH without emitting a delta receipt
    sl.consolidate()
    before = sl.receipt()["deltaH_since_last"]
    assert sl.receipt()["deltaH_since_last"] == before  # unchanged by peek
    assert sl.delta_receipt()["deltaH_since_last"] == before  # consumes
    assert sl.receipt()["deltaH_since_last"] == 0.0


def test_pool_cap_bounds_memory():
    Y, psi = _data(32 * 3, 8, seed=12)
    sl = StreamingLattice(
        psi, shard_size=32, max_shards=8, kneighbors=4,
        candidate_pool=16, pool_cap=20,
    )
    sl.append(Y)
    assert sl._pool_ids.shape[0] <= 20
    assert len(sl.bundle(k=50, diversify=False)) <= 20


def test_composed_receipt_signature_covers_every_field():
    """Review fix: tampering with ANY field of a signed composed/delta
    receipt must fail verification (previously total_rows / generation /
    super were unsigned)."""
    from oscillink_tpu.core.receipts import verify_component

    Y, psi = _data(64, 16, seed=13)
    sl = StreamingLattice(
        psi, shard_size=32, max_shards=4, kneighbors=4, receipt_secret="s"
    )
    rec = sl.append(Y)[-1]
    for field, forged in [
        ("total_rows", 10**6),
        ("generation", 7),
        ("buffered", 99),
        ("super", {**rec["super"], "ranking": rec["super"]["ranking"][::-1]}),
    ]:
        bad = dict(rec)
        bad[field] = forged
        assert not verify_component(bad, "s"), field
    assert verify_component(rec, "s")

    batch = hierarchical_settle(Y, psi, n_shards=2, kneighbors=4,
                                receipt_secret="s")
    forged = dict(batch)
    forged["super"] = {**batch["super"], "ranking": batch["super"]["ranking"][::-1]}
    assert not verify_component(forged, "s")
    assert verify_component(batch, "s")
