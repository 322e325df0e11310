"""Fresh-process large-N E2E under the persistent compile cache.

Round 3's `rows_round3` 500k E2E (107.4 s) was measured with warm
IN-PROCESS compiles, and `build_decomp2_500k.json` attributed ~87-103 s of
it to tunnel alloc/dispatch pathology on ~3-10 s of device compute; a
genuinely fresh process additionally paid a measured 36-minute window-ctx
cold compile (`analysis_late_round3`).  The persistent compile cache
(utils/compile_cache.py, VERDICT r3 item 4) was demonstrated at service
shapes (19.6 s -> 1.76 s) but never at the scale where compiles actually
hurt.  This probe measures the DEPLOYABLE story at large N:

  process A ("cold"):  fresh interpreter, empty OSCILLINK_COMPILE_CACHE_DIR
                       -> pays every compile once, populates the cache
  process B ("warm"):  another fresh interpreter, same cache dir
                       -> the wall a real re-deployed serving process pays

Each process runs ONE build+settle+full-receipt pass (the reference's E2E
metric, reference README.md:174-184) with per-stage walls.  Results append
to benchmarks/e2e_cachewarm.json under the given label.

Usage:
  export OSCILLINK_COMPILE_CACHE_DIR=/tmp/oscjax_large
  python benchmarks/probe_e2e_cachewarm.py 500000 iso cold
  python benchmarks/probe_e2e_cachewarm.py 500000 iso warm
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D, K = 768, 8
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "e2e_cachewarm.json"
)


def _data(n, seed=0, corpus="iso"):
    rng = np.random.default_rng(seed)
    if corpus == "clustered":
        centers = rng.standard_normal((1024, D)).astype(np.float32)
        assign = rng.integers(0, 1024, size=n)
        Y = centers[assign] + 0.6 * rng.standard_normal((n, D)).astype(np.float32)
    else:
        Y = rng.standard_normal((n, D)).astype(np.float32)
    psi = (Y[:64].mean(0) / (np.linalg.norm(Y[:64].mean(0)) + 1e-12)).astype(
        np.float32
    )
    return Y, psi


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    corpus = sys.argv[2] if len(sys.argv) > 2 else "iso"
    label = sys.argv[3] if len(sys.argv) > 3 else "run"

    from oscillink_tpu.utils.compile_cache import configure_compile_cache

    cache_dir = configure_compile_cache()
    print(f"# compile cache: {cache_dir}", flush=True)

    t_host = time.perf_counter()
    Y, psi = _data(n, corpus=corpus)
    host_prep_ms = 1000.0 * (time.perf_counter() - t_host)
    print(f"# host data prep: {host_prep_ms:.0f} ms", flush=True)

    from oscillink_tpu import OscillinkLattice

    t0 = time.perf_counter()
    lat = OscillinkLattice(Y, kneighbors=K, similarity="auto")
    build_ms = 1000.0 * (time.perf_counter() - t0)
    print(f"# build: {build_ms:.0f} ms (sim={lat._similarity})", flush=True)

    lat.set_query(psi)
    t1 = time.perf_counter()
    s = lat.settle(dt=1.0, max_iters=12, tol=1e-3)
    settle_ms = 1000.0 * (time.perf_counter() - t1)
    print(f"# settle: {settle_ms:.0f} ms iters={s['iters']}", flush=True)

    t2 = time.perf_counter()
    rec = lat.receipt()
    receipt_ms = 1000.0 * (time.perf_counter() - t2)
    e2e_ms = 1000.0 * (time.perf_counter() - t0)
    print(
        f"# receipt: {receipt_ms:.0f} ms  dH={rec['deltaH_total']:.1f} "
        f"nulls={len(rec['null_points'])}",
        flush=True,
    )
    print(f"# E2E (build+settle+receipt wall): {e2e_ms:.0f} ms", flush=True)

    row = {
        "label": label,
        "N": n,
        "D": D,
        "k": K,
        "corpus": corpus,
        "similarity": str(lat._similarity),
        "compile_cache_dir": cache_dir,
        "host_prep_ms": round(host_prep_ms, 1),
        "build_ms": round(build_ms, 1),
        "settle_ms": round(settle_ms, 1),
        "settle_iters": int(s["iters"]),
        "receipt_full_ms": round(receipt_ms, 1),
        "e2e_build_settle_receipt_ms": round(e2e_ms, 1),
        "deltaH": round(float(rec["deltaH_total"]), 1),
        "null_points": len(rec["null_points"]),
    }
    doc = {"note": __doc__.strip().splitlines()[0], "runs": []}
    if os.path.exists(OUT):
        try:
            doc = json.load(open(OUT))
        except Exception:
            pass
    doc.setdefault("runs", []).append(row)
    json.dump(doc, open(OUT, "w"), indent=1)
    print(f"# appended '{label}' to {OUT}", flush=True)


if __name__ == "__main__":
    main()
