"""U* warm-start at the 1M serving scale: after a settle, start the
stationary CG from the settled U (OSCILLINK_USTAR_WARMSTART=1) instead of
the reference's x0 = Y.  Identical solution within tol; fewer iterations —
each iteration at 1M x 768 costs ~0.5-1 s, so saved iterations are seconds
off every receipt.

Flow: clustered corpus (IVF-accepted build), settle x2, then the U* solve
measured contract-mode and warm-start-mode (refresh_Ustar between; both
c=8 column-chunked with the settled U resident).

Run detached: nohup python benchmarks/probe_ustar_warmstart_1m.py > log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ustar_warmstart_1m.json")
N, D, K = 1_000_000, 768, 8


def main():
    from oscillink_tpu.core.lattice import OscillinkLattice

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((1024, D)).astype(np.float32)
    assign = rng.integers(0, 1024, size=N)
    Y = centers[assign] + 0.6 * rng.standard_normal((N, D)).astype(np.float32)
    psi = (Y[:64].mean(0) / (np.linalg.norm(Y[:64].mean(0)) + 1e-12)).astype(
        np.float32
    )

    t0 = time.perf_counter()
    lat = OscillinkLattice(Y, kneighbors=K, similarity="auto")
    print(f"# build {time.perf_counter()-t0:.0f}s sim={lat._similarity} "
          f"info={getattr(lat, '_similarity_info', None)}", flush=True)
    lat.set_query(psi)
    lat.settle(dt=1.0, max_iters=12, tol=1e-3)
    lat.settle(dt=1.0, max_iters=12, tol=1e-3)

    res = {}
    for mode, env in (("contract_x0_Y", ""), ("warmstart_x0_U", "1")):
        os.environ["OSCILLINK_USTAR_WARMSTART"] = env
        times, iters = [], None
        for rep in range(3):
            lat.refresh_Ustar()
            t0 = time.perf_counter()
            lat.solve_Ustar(tol=1e-4, max_iters=64)
            times.append(round(1000.0 * (time.perf_counter() - t0), 1))
            iters = int(lat.last_ustar["iters"])
        res[mode] = {"solve_ms": times, "best_ms": min(times), "iters": iters,
                     "res": float(lat.last_ustar["res"])}
        print(f"# {mode}: {res[mode]}", flush=True)

    res["note"] = (
        "1M x 768 x k8 clustered corpus, settled state resident (c=8 "
        "column-chunked solve); warm-start saves iterations at an identical "
        "solution within tol (tests/test_lowmem_solve.py parity)"
    )
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
