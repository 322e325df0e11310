"""500k U* + full receipt under the full-width windowed auto-route.

MEASURED (fw500k_ustar.json): U* 550 ms min-of-3 (vs 663 on the gather
route), receipt_full 2245 ms (receipt path unchanged — it chunks on
_auto_col_chunks as before).  One sharp edge found and encoded below: the
first version of this probe held a reference to the PREVIOUS U* solution
across solves and ResourceExhausted on the repeat — the full-width solve
budget has no headroom for an extra held [N, D] block at 500k.  The
production pattern (solve -> cache -> reuse; invalidation frees before
re-solve) never holds two solutions, and every fw500k_lattice child's
receipt plus this probe's three freed-between solves confirm it fits.

fw500k_lattice.json measured the SETTLE at 372 ms auto-routed; the U*
stationary solve takes the same full-width windowed branch (one fewer live
block than the settle, so fit follows a fortiori — and every probe child's
receipt already exercised it).  This probe pins the walls: U* min-of-3
(cache bypassed) and the full receipt, completing the 500k device-side
E2E row (build 3.1 s + settle 0.372 + U* X + receipt Y).

Writes benchmarks/fw500k_ustar.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("OSCILLINK_COMPILE_CACHE_DIR", "/tmp/oscillink_jaxcache")

import numpy as np


def main():
    import jax

    from oscillink_tpu.core.lattice import OscillinkLattice

    n, d, k = 500_000, 768, 8
    rng = np.random.default_rng(0)  # SAME corpus as fw500k_lattice
    centers = rng.standard_normal((64, d)).astype(np.float32)
    assign = np.sort(rng.integers(0, 64, size=n))
    Y = (centers[assign] + 0.35 * rng.standard_normal((n, d))).astype(np.float32)
    psi = (Y[:64].mean(0) / (np.linalg.norm(Y[:64].mean(0)) + 1e-12)).astype(
        np.float32
    )

    t0 = time.perf_counter()
    lat = OscillinkLattice(Y, kneighbors=k, similarity="fast")
    build_ms = 1000.0 * (time.perf_counter() - t0)
    lat.set_query(psi)
    assert lat._window_ctx is not None and lat._window_fullwidth
    out = {
        "config": "N=500k D=768 k=8 clustered (same corpus as "
        "fw500k_lattice), pure auto routing, min-of-3 warm walls",
        "build_ms": round(build_ms, 1),
        "coverage": round(float(lat._window_coverage), 4),
    }

    lat.settle(dt=1.0, max_iters=12, tol=1e-3)

    walls = []
    for _ in range(3):
        # drop every reference to the previous solution BEFORE the next
        # solve: holding it is +1 resident [N, D] block (1.5 GB at 500k)
        # the solve program doesn't budget for
        lat._invalidate_cache()
        t0 = time.perf_counter()
        U = lat._solve_ustar_device(use_cache=False)
        jax.block_until_ready(U)
        walls.append(round(1000.0 * (time.perf_counter() - t0), 1))
        del U
        lat._invalidate_cache()
        print(f"# ustar wall: {walls[-1]} ms", flush=True)
    out["ustar_ms_all"] = walls
    out["ustar_ms"] = min(walls)
    print(json.dumps(out), flush=True)

    rwalls = []
    for _ in range(3):
        lat._invalidate_cache()
        t0 = time.perf_counter()
        rec = lat.receipt()
        rwalls.append(round(1000.0 * (time.perf_counter() - t0), 1))
    out["receipt_full_ms_all"] = rwalls
    out["receipt_full_ms"] = min(rwalls)
    out["deltaH"] = float(rec["deltaH_total"])
    out["gather_route_anchor"] = (
        "rows_round5 clustered 500k: ustar 663 ms, receipt_full 1876.9 ms"
    )
    with open(os.path.join(REPO, "benchmarks", "fw500k_ustar.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
