"""Micro-benchmarks of lattice dynamics (reference scripts/bench_micro_dynamics.py):
row-cap vs edge density, and warm- vs cold-start settle iterations.

  python scripts/bench_micro_dynamics.py --n 300 --d 64
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=300)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from oscillink_tpu import OscillinkLattice

    rng = np.random.default_rng(args.seed)
    Y = rng.standard_normal((args.n, args.d)).astype(np.float32)
    psi = rng.standard_normal(args.d).astype(np.float32)

    # 1. row_cap sweep -> edge density / avg degree
    cap_rows = []
    for cap in (0.25, 0.5, 1.0, 2.0, 4.0):
        lat = OscillinkLattice(Y, kneighbors=args.k, row_cap_val=cap, deterministic_k=True)
        lat.set_query(psi)
        rec = lat.receipt()
        cap_rows.append(
            {
                "row_cap": cap,
                "avg_degree": rec["meta"]["avg_degree"],
                "edge_density": rec["meta"]["edge_density"],
                "deltaH": rec["deltaH_total"],
            }
        )

    # 2. warm vs cold start settle iterations across repeated queries
    lat = OscillinkLattice(Y, kneighbors=args.k, deterministic_k=True)
    lat.set_query(psi)
    cold = lat.settle(warm_start=False, max_iters=50, tol=1e-4)
    cold_iters = cold["iters"]
    warm = lat.settle(warm_start=True, max_iters=50, tol=1e-4)
    warm_iters = warm["iters"]
    blend = lat.settle(warm_start=True, inertia=0.5, max_iters=50, tol=1e-4)
    blend_iters = blend["iters"]

    result = {
        "row_cap_sweep": cap_rows,
        "start_modes": {
            "cold_iters": int(cold_iters),
            "warm_iters": int(warm_iters),
            "inertia_0.5_iters": int(blend_iters),
        },
    }
    text = json.dumps(result, indent=2)
    if args.out:
        open(args.out, "w").write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
