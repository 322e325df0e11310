"""bundle(), chain_receipt(), dynamics snapshot, logging/callbacks."""

import numpy as np

from oscillink_tpu import OscillinkLattice


def _lat(seed=0, n=40, d=12):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=4, deterministic_k=True)
    lat.set_query(rng.standard_normal(d).astype(np.float32))
    return lat


def test_bundle_structure():
    lat = _lat()
    out = lat.bundle(k=5)
    assert len(out) == 5
    ids = [e["id"] for e in out]
    assert len(set(ids)) == 5
    for e in out:
        assert set(e) == {"id", "score", "align"}
        assert -1.01 <= e["align"] <= 1.01


def test_bundle_k_larger_than_n():
    lat = _lat(1, n=6)
    out = lat.bundle(k=50)
    assert len(out) == 6


def test_bundle_rerank_mode_is_pure_score_order():
    lat = _lat(3)
    out = lat.bundle(k=40, alpha=0.3, diversify=False)
    assert len(out) == 40
    scores = [e["score"] for e in out]
    assert scores == sorted(scores, reverse=True)
    assert len({e["id"] for e in out}) == 40
    # MMR and rerank agree on the score vector but generally not on order
    mmr = lat.bundle(k=40, alpha=0.3, diversify=True)
    assert {e["id"]: round(e["score"], 6) for e in mmr} == {
        e["id"]: round(e["score"], 6) for e in out
    }


def test_bundle_rerank_top1_matches_mmr_top1():
    # MMR's first pick is the raw argmax, so the two modes share it
    lat = _lat(4)
    a = lat.bundle(k=5, alpha=0.5, diversify=False)
    b = lat.bundle(k=5, alpha=0.5, diversify=True)
    assert a[0]["id"] == b[0]["id"]


def test_chain_receipt_fields():
    lat = _lat(2)
    chain = [0, 3, 5, 9]
    lat.add_chain(chain, lamP=0.2)
    rec = lat.chain_receipt(chain)
    assert set(rec) == {"verdict", "weakest_link", "coherence_gain", "edges"}
    assert len(rec["edges"]) == len(chain) - 1
    for e in rec["edges"]:
        assert {"k", "edge", "z_struct", "z_path", "r_struct", "r_path"} <= set(e)
    assert isinstance(rec["verdict"], bool)


def test_chain_receipt_without_add_chain():
    lat = _lat(3)
    rec = lat.chain_receipt([0, 1, 2])
    assert len(rec["edges"]) == 2


def test_dynamics_snapshot(monkeypatch):
    monkeypatch.setenv("OSCILLINK_RECEIPT_DYNAMICS", "1")
    lat = _lat(4)
    lat.settle(max_iters=10)
    rec = lat.receipt()
    dyn = rec["meta"].get("dynamics")
    assert dyn is not None
    for key in (
        "temperature",
        "step_deltaH",
        "viscosity_step",
        "flow_total",
        "top_flows",
        "radius",
        "move2_mean",
        "move2_max",
    ):
        assert key in dyn
    assert dyn["temperature"] >= 0.0
    assert dyn["radius"] >= 0


def test_null_cap(monkeypatch):
    monkeypatch.setenv("OSCILLINK_RECEIPT_NULL_CAP", "1")
    rng = np.random.default_rng(5)
    Y = rng.standard_normal((40, 12)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=4)
    lat.set_query(rng.standard_normal(12).astype(np.float32))
    rec = lat.receipt()
    meta = rec["meta"]["null_points_summary"]
    assert len(rec["null_points"]) <= 1
    if meta["total_null_points"] > 1:
        assert meta["null_cap_applied"]


def test_logger_events_and_callbacks():
    events = []
    lat = _lat(6)
    lat.set_logger(lambda ev, payload: events.append(ev))
    called = []
    lat.add_settle_callback(lambda lattice, stats: called.append(stats["iters"]))
    lat.settle(max_iters=5)
    assert "settle" in events
    assert called and called[0] >= 1
    # broken callbacks are swallowed
    lat.add_settle_callback(lambda *a: 1 / 0)
    lat.settle(max_iters=5)

    def bad_logger(ev, payload):
        raise RuntimeError("boom")

    lat.set_logger(bad_logger)
    lat.settle(max_iters=5)  # must not raise


def test_receipt_detail_light():
    lat = _lat(7)
    lat.set_receipt_detail("light")
    rec = lat.receipt()
    assert rec["null_points"] == []
    assert rec["coh_drop_sum"] == 0.0
    assert rec["meta"]["receipt_detail"] == "light"
