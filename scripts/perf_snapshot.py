"""Capture a perf snapshot usable as the perf_check baseline
(reference scripts/perf_snapshot.py).

  python scripts/perf_snapshot.py --out scripts/perf_baseline.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys

from benchmark import aggregate, main as _  # noqa: F401  (shared helpers)


def main(argv=None):
    import json

    from benchmark import _mk_data, run_trial

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--out", default="scripts/perf_baseline.json")
    args = p.parse_args(argv)

    Y, psi = _mk_data(args.n, args.d, 0)
    run_trial(Y, psi, args.k, True, 12, 1e-3)  # compile
    trials = [run_trial(Y, psi, args.k, True, 12, 1e-3) for _ in range(args.trials)]
    snap = {
        "config": {"N": args.n, "D": args.d, "k": args.k},
        "aggregates": aggregate(trials),
    }
    with open(args.out, "w") as f:
        json.dump(snap, f, indent=2)
    print(json.dumps(snap, indent=2))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, "scripts")
    sys.exit(main())
