"""Main perf harness (reference scripts/benchmark.py:32-346): build / settle /
receipt timings + deltaH aggregates over repeated trials, JSON output.

Usage:
  python scripts/benchmark.py --n 1200 --d 128 --k 6 --trials 5 --out out.json
  python scripts/benchmark.py --proof          # nulls + chain verdict + diffusion compare
  python scripts/benchmark.py --memprof        # tracemalloc peak
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time

import numpy as np


def _mk_data(n, d, seed):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = (Y[: max(4, n // 10)].mean(axis=0)).astype(np.float32)
    psi /= np.linalg.norm(psi) + 1e-12
    return Y, psi


def run_trial(Y, psi, k, light, settle_iters, tol):
    from oscillink_tpu import OscillinkLattice

    t0 = time.perf_counter()
    lat = OscillinkLattice(Y, kneighbors=k)
    t1 = time.perf_counter()
    lat.set_query(psi)
    if light:
        lat.set_receipt_detail("light")
    lat.settle(max_iters=settle_iters, tol=tol)
    t2 = time.perf_counter()
    rec = lat.receipt()
    t3 = time.perf_counter()
    return {
        "build_ms": 1000 * (t1 - t0),
        "settle_ms": 1000 * (t2 - t1),
        "receipt_ms": 1000 * (t3 - t2),
        "deltaH": float(rec["deltaH_total"]),
        "null_points": len(rec["null_points"]),
        "ustar_iters": rec["meta"]["ustar_iters"],
        "ustar_res": rec["meta"]["ustar_res"],
    }


def aggregate(trials):
    keys = ("build_ms", "settle_ms", "receipt_ms", "deltaH")
    out = {}
    for key in keys:
        vals = [t[key] for t in trials]
        out[key] = {
            "mean": float(np.mean(vals)),
            "min": float(np.min(vals)),
            "max": float(np.max(vals)),
            "p50": float(np.median(vals)),
        }
    return out


def proof_mode(args):
    from oscillink_tpu import OscillinkLattice, compute_diffusion_gates

    Y, psi = _mk_data(args.n, args.d, args.seed)
    lat = OscillinkLattice(Y, kneighbors=args.k)
    lat.set_query(psi)
    lat.settle()
    rec = lat.receipt()
    chain = list(range(min(8, args.n)))
    lat.add_chain(chain, lamP=0.2)
    crec = lat.chain_receipt(chain)
    t0 = time.perf_counter()
    gates = compute_diffusion_gates(Y, psi, kneighbors=args.k)
    gate_ms = 1000 * (time.perf_counter() - t0)
    lat2 = OscillinkLattice(Y, kneighbors=args.k)
    lat2.set_query(psi, gates=gates)
    lat2.settle()
    rec2 = lat2.receipt()
    return {
        "nulls": len(rec["null_points"]),
        "deltaH_uniform": rec["deltaH_total"],
        "deltaH_gated": rec2["deltaH_total"],
        "gate_build_ms": gate_ms,
        "chain_verdict": crec["verdict"],
        "weakest_link": crec["weakest_link"],
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1200)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--settle-iters", type=int, default=12)
    p.add_argument("--light", action="store_true")
    p.add_argument("--proof", action="store_true")
    p.add_argument("--memprof", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    if args.trials < 1:
        p.error("--trials must be >= 1")

    if args.memprof:
        import tracemalloc

        tracemalloc.start()

    if args.proof:
        result = {"proof": proof_mode(args)}
    else:
        Y, psi = _mk_data(args.n, args.d, args.seed)
        run_trial(Y, psi, args.k, args.light, args.settle_iters, args.tol)  # warm/compile
        trials = [
            run_trial(Y, psi, args.k, args.light, args.settle_iters, args.tol)
            for _ in range(args.trials)
        ]
        result = {
            "config": {"N": args.n, "D": args.d, "k": args.k, "trials": args.trials},
            "trials": trials,
            "aggregates": aggregate(trials),
        }

    if args.memprof:
        import tracemalloc

        cur, peak = tracemalloc.get_traced_memory()
        result["memory"] = {"current_mb": cur / 1e6, "peak_mb": peak / 1e6}

    text = json.dumps(result, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
