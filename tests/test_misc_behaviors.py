"""Receipt gating stats, job TTL purge, bundle-cache TTL (reference test
behaviors: test_receipt_gating_stats, jobs purge, services/cache)."""

import time

import numpy as np

from oscillink_tpu import OscillinkLattice
from oscillink_tpu.service.cache import BundleCache
from oscillink_tpu.service.jobs import JobStore


def test_receipt_gating_stats():
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((30, 8)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=3)
    psi = rng.standard_normal(8).astype(np.float32)
    lat.set_query(psi)
    rec = lat.receipt()
    m = rec["meta"]
    assert m["gates_min"] == m["gates_max"] == m["gates_mean"] == 1.0
    assert m["gates_uniform"] is True

    gates = rng.uniform(0.2, 0.9, 30).astype(np.float32)
    lat.set_gates(gates)
    rec2 = lat.receipt()
    m2 = rec2["meta"]
    assert m2["gates_uniform"] is False
    assert abs(m2["gates_mean"] - float(gates.mean())) < 1e-6
    assert m2["gates_min"] == float(gates.min())
    # avg_degree/edge_density present and sane
    assert 0 < m2["avg_degree"] <= 6
    assert 0 < m2["edge_density"] < 1


def test_job_store_ttl_purge(monkeypatch):
    monkeypatch.setenv("OSCILLINK_JOB_TTL", "0")
    store = JobStore()
    rec = store.submit(lambda: {"ok": True})
    deadline = time.time() + 10
    while time.time() < deadline and store.get(rec["id"])["status"] != "done":
        time.sleep(0.02)
    assert store.get(rec["id"])["status"] == "done"
    time.sleep(0.05)
    store.purge()  # TTL=0: finished jobs purge immediately
    assert store.get(rec["id"]) is None


def test_job_cancel_queued():
    store = JobStore()
    import threading

    gate = threading.Event()
    store.submit(lambda: (gate.wait(5), {"ok": 1})[1])  # occupies the worker
    rec2 = store.submit(lambda: {"ok": 2})
    out = store.cancel(rec2["id"])
    assert out["status"] == "cancelled"
    gate.set()


def test_job_priority_queue_reorders():
    """priority=True jobs dequeue ahead of earlier-submitted normal jobs
    (the enterprise priority_queue feature, a dead flag in the reference)."""
    import threading

    store = JobStore()
    gate = threading.Event()
    order: list[str] = []

    def job(tag, block=False):
        def run():
            if block:
                gate.wait(10)
            order.append(tag)
            return {"tag": tag}

        return run

    first = store.submit(job("blocker", block=True))
    deadline = time.time() + 10  # wait until the worker is occupied
    while time.time() < deadline and store.get(first["id"])["status"] != "running":
        time.sleep(0.01)
    assert store.get(first["id"])["status"] == "running"
    store.submit(job("normal-1"))
    store.submit(job("normal-2"))
    prio = store.submit(job("prio"), priority=True)
    assert prio["priority"] is True
    gate.set()
    deadline = time.time() + 10
    while time.time() < deadline and len(order) < 4:
        time.sleep(0.02)
    assert order == ["blocker", "prio", "normal-1", "normal-2"]
    assert store.get(first["id"])["status"] == "done"


def test_job_store_concurrent_submissions():
    """JobStore stays consistent under concurrent submitters."""
    import threading

    store = JobStore()
    ids = []
    lock = threading.Lock()

    def submit_some():
        for _ in range(10):
            rec = store.submit(lambda: {"ok": True})
            with lock:
                ids.append(rec["id"])

    threads = [threading.Thread(target=submit_some) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(set(ids)) == 40
    deadline = time.time() + 30
    while time.time() < deadline:
        if all(store.get(i)["status"] == "done" for i in ids):
            break
        time.sleep(0.05)
    assert all(store.get(i)["status"] == "done" for i in ids)


def test_bundle_cache_ttl_and_lru(monkeypatch):
    monkeypatch.setenv("OSCILLINK_BUNDLE_CACHE_TTL", "100")
    monkeypatch.setenv("OSCILLINK_BUNDLE_CACHE_SIZE", "2")
    cache = BundleCache()
    cache.put("k", "sig1", [{"id": 1}])
    cache.put("k", "sig2", [{"id": 2}])
    cache.put("k", "sig3", [{"id": 3}])  # evicts sig1 (LRU)
    assert cache.get("k", "sig1") is None
    assert cache.get("k", "sig2")["bundle"] == [{"id": 2}]
    # TTL expiry
    monkeypatch.setenv("OSCILLINK_BUNDLE_CACHE_TTL", "0.0")
    assert cache.get("k", "sig2") is None
    # disabled cache stores nothing
    cache2 = BundleCache()
    cache2.put("k", "x", [])
    assert cache2.get("k", "x") is None
