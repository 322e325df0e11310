"""Scale sweep: N x D x k -> JSONL timings with light receipts
(reference scripts/scale_benchmark.py:23-71).

  python scripts/scale_benchmark.py --sizes 100,500,1000,2000,5000 --d 128 --k 6 \
      --out benchmarks/scale_latest.jsonl
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="100,500,1000,2000,5000")
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from oscillink_tpu import OscillinkLattice

    lines = []
    for n in [int(s) for s in args.sizes.split(",")]:
        rng = np.random.default_rng(args.seed)
        Y = rng.standard_normal((n, args.d)).astype(np.float32)
        psi = rng.standard_normal(args.d).astype(np.float32)

        def one():
            t0 = time.perf_counter()
            lat = OscillinkLattice(Y, kneighbors=args.k)
            build_ms = 1000 * (time.perf_counter() - t0)
            lat.set_query(psi)
            lat.set_receipt_detail("light")
            t1 = time.perf_counter()
            lat.settle(max_iters=12, tol=1e-3)
            settle_ms = 1000 * (time.perf_counter() - t1)
            t2 = time.perf_counter()
            rec = lat.receipt()
            ustar_ms = 1000 * (time.perf_counter() - t2)
            return build_ms, settle_ms, ustar_ms, rec

        one()  # warm compile for this shape
        for trial in range(args.trials):
            build_ms, settle_ms, ustar_ms, rec = one()
            line = {
                "N": n,
                "D": args.d,
                "k": args.k,
                "trial": trial,
                "graph_build_ms": build_ms,
                "ustar_solve_ms": float(rec["meta"]["ustar_solve_ms"]),
                "receipt_ms": ustar_ms,
                "last_settle_ms": settle_ms,
                "deltaH": float(rec["deltaH_total"]),
                "ustar_iters": rec["meta"]["ustar_iters"],
                "ustar_res": rec["meta"]["ustar_res"],
                "ustar_converged": rec["meta"]["ustar_converged"],
            }
            lines.append(line)
            print(json.dumps(line))

    if args.out:
        with open(args.out, "w") as f:
            for line in lines:
                f.write(json.dumps(line) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
