"""Large-N end-to-end measurement: build + settle + FULL receipt at 500k/1M.

The reference's headline metric is E2E (README.md:174-184 build+settle+
receipt); round 2 carried only settle/U* at these scales and the full
receipt (per-node components + null points) had never been timed — its
[N, K, D] gathered temp is ~24 GB at 1M before the row-blocked pass
(ops/receipts.py:_edge_sq_dists) landed.

Per N in {500k, 1M} (D=768, k=8, similarity="auto" -> recall-0.99 fast scan):
  build_ms        lattice construction (graph build, device-synced)
  settle_warm_ms  second settle call (compile-cached)
  ustar_ms        stationary solve (receipt's dominant solve)
  receipt_full_ms full receipt wall time incl. per-node components, null
                  points, meta assembly and the tunnel fetch
  bundle_ms       bundle(k=8)
  e2e_ms          build + settle + full receipt on a FRESH lattice (the
                  reference's metric), single wall-clock

Appends a rows_round3 section to benchmarks/scale_tpu.json.
Run detached: nohup python benchmarks/probe_large_e2e.py > log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D, K = 768, 8
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_tpu.json")


def _data(n, seed=0, corpus="iso"):
    rng = np.random.default_rng(seed)
    if corpus == "clustered":
        # 1024 modes, spread 0.6 — the balanced-IVF study's loose corpus
        # (benchmarks/ivf_balanced_1m.json): exercises the accepted IVF path
        centers = rng.standard_normal((1024, D)).astype(np.float32)
        assign = rng.integers(0, 1024, size=n)
        Y = centers[assign] + 0.6 * rng.standard_normal((n, D)).astype(np.float32)
    else:
        Y = rng.standard_normal((n, D)).astype(np.float32)
    psi = (Y[:64].mean(0) / (np.linalg.norm(Y[:64].mean(0)) + 1e-12)).astype(
        np.float32
    )
    return Y, psi


def run_one(n, corpus="iso"):
    from oscillink_tpu import OscillinkLattice

    print(f"# ---- N={n} corpus={corpus} ----", flush=True)
    Y, psi = _data(n, corpus=corpus)

    t0 = time.perf_counter()
    lat = OscillinkLattice(Y, kneighbors=K, similarity="auto")
    build_ms = 1000.0 * (time.perf_counter() - t0)
    print(f"# build: {build_ms:.0f} ms (sim={lat._similarity})", flush=True)

    lat.set_query(psi)
    s1 = lat.settle(dt=1.0, max_iters=12, tol=1e-3)  # cold (compile)
    print(f"# settle cold: {s1['t_ms']:.0f} ms iters={s1['iters']}", flush=True)
    s2 = lat.settle(dt=1.0, max_iters=12, tol=1e-3)
    print(f"# settle warm: {s2['t_ms']:.0f} ms", flush=True)

    t0 = time.perf_counter()
    rec = lat.receipt()  # full detail: U* + deltaH + components + nulls
    receipt_cold_ms = 1000.0 * (time.perf_counter() - t0)
    u = rec["meta"]
    print(
        f"# receipt cold: {receipt_cold_ms:.0f} ms  dH={rec['deltaH_total']:.1f} "
        f"nulls={len(rec['null_points'])} ustar_ms={u['ustar_solve_ms']:.0f}",
        flush=True,
    )
    # warm receipt re-solves nothing (signature cache) — measure the
    # diagnostics+fetch cost alone by invalidating only the cached receipt
    lat.refresh_Ustar()
    t0 = time.perf_counter()
    rec2 = lat.receipt()
    receipt_warm_ms = 1000.0 * (time.perf_counter() - t0)
    print(f"# receipt warm(recomputed U*): {receipt_warm_ms:.0f} ms", flush=True)

    t0 = time.perf_counter()
    b = lat.bundle(k=8)
    bundle_ms = 1000.0 * (time.perf_counter() - t0)
    print(f"# bundle: {bundle_ms:.0f} ms top={[e['id'] for e in b[:3]]}", flush=True)

    # the reference's metric: one fresh pass, single wall-clock
    del lat
    t0 = time.perf_counter()
    lat2 = OscillinkLattice(Y, kneighbors=K, similarity="auto")
    lat2.set_query(psi)
    lat2.settle(dt=1.0, max_iters=12, tol=1e-3)
    rec3 = lat2.receipt()
    e2e_ms = 1000.0 * (time.perf_counter() - t0)
    print(f"# e2e fresh (warm-compiled): {e2e_ms:.0f} ms", flush=True)

    info = getattr(lat2, "_similarity_info", None)
    sim_label = f"auto->{lat2._similarity}"
    if info is not None:
        sim_label += f" ({info.get('mode')}: {info.get('reason', 'accepted')})"
    return {
        "N": n,
        "D": D,
        "k": K,
        "corpus": corpus,
        "similarity": sim_label,
        "build_ms": round(build_ms, 1),
        "settle_warm_ms": round(s2["t_ms"], 1),
        "settle_iters": int(s2["iters"]),
        "ustar_ms": round(float(u["ustar_solve_ms"]), 1),
        "receipt_full_cold_ms": round(receipt_cold_ms, 1),
        "receipt_full_ms": round(receipt_warm_ms, 1),
        "bundle_ms": round(bundle_ms, 1),
        "e2e_build_settle_receipt_ms": round(e2e_ms, 1),
        "deltaH": round(float(rec["deltaH_total"]), 1),
        "null_points": len(rec["null_points"]),
        "note": "full receipt via row-blocked edge pass; e2e is a fresh "
        "container pass with compile cache warm (the reference metric)",
    }


def main():
    specs = []
    for a in sys.argv[1:]:
        if ":" in a:
            n_s, corpus = a.split(":", 1)
            specs.append((int(n_s), corpus))
        else:
            specs.append((int(a), "iso"))
    specs = specs or [(500_000, "iso"), (1_000_000, "iso"), (1_000_000, "clustered")]
    rows = []
    for n, corpus in specs:
        try:
            rows.append(run_one(n, corpus))
        except Exception as e:  # pragma: no cover
            print(f"# N={n} FAILED: {type(e).__name__}: {e}", flush=True)
            rows.append({"N": n, "corpus": corpus,
                         "error": f"{type(e).__name__}: {e}"})

    section = os.getenv("OSC_SCALE_SECTION", "rows_round3")
    data = json.load(open(OUT))
    # merge keyed by (N, corpus): keep rows not re-run, and never let a
    # failed re-run overwrite a recorded good row with an error row
    old = {
        (r.get("N"), r.get("corpus", "iso")): r
        for r in data.get(section, [])
        if "error" not in r
    }
    for r in rows:
        key = (r.get("N"), r.get("corpus", "iso"))
        if "error" in r and key in old:
            continue
        old[key] = r
    rows = [old[k] for k in sorted(old)]
    if section == "rows_round3":
        data["note_round3"] = (
            "round 3: similarity='auto' routes large-N builds to the "
            "recall-0.99 fast scan; full receipts run through the "
            "row-blocked edge pass (bounded temps); e2e = build+settle+"
            "full receipt, the reference's headline metric"
        )
    elif section == "rows_round4":
        data["note_round4"] = (
            "round 4: same protocol as rows_round3. First re-measure after "
            "the aligned window geometry (R=W=384) exposed that the "
            "windowed tier LOSES under column-chunked solves (each chunk "
            "re-streams the whole one-hot per apply): 500k c=2 settle "
            "2450 ms / 1M c=8 7782 ms vs the gather path's 1479/2912. The "
            "lattice now gates the windowed ctx on an unchunked solve "
            "(core/lattice.py _maybe_build_window_ctx); these rows are the "
            "post-gate walls (gather path at these scales, windowed "
            "reserved for the <=~400k unchunked regime and the per-shard "
            "halo tier where it measures 51.9 ms cg5 at 125k)."
        )
    elif section == "rows_round5":
        data["note_round5"] = (
            "round 5: same protocol, re-measured WITH the chunked-solve "
            "window gate active (core/lattice.py _maybe_build_window_ctx "
            "skips the windowed ctx when _auto_col_chunks() > 1, pinned by "
            "tests/test_window_spmv.py::test_auto_mode_skips_chunked_solves)."
            " rows_round4 recorded the pre-gate regression (1M clustered "
            "settle 7782 ms vs round-3 2912) because the aligned-windowed "
            "default engaged under column-chunked solves; these rows are "
            "the authoritative large-N walls."
        )
    data[section] = rows
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
