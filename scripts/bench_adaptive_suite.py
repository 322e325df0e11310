"""Adaptive benchmark suite across datasets and embedding modes.

Reference: scripts/bench_adaptive_suite.py (runs benchmark_adaptive over
mars/paris x random/semantic and consolidates one JSON).  Here the labeled
corpora are the in-tree proof_hallucination ones (astronomy/capitals/rivers)
and the cases run in-process — same tune/test split and grid as
scripts/benchmark_adaptive.py.

  python scripts/bench_adaptive_suite.py --trials 20 --k 3 --out suite.json
  python scripts/bench_adaptive_suite.py --semantic-only
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse
import io
import json
from contextlib import redirect_stdout

import benchmark_adaptive


def run_case(dataset: str, semantic: bool, trials: int, k: int, seed: int) -> dict:
    argv = [
        "--dataset", dataset,
        "--trials", str(trials),
        "--k", str(k),
        "--seed", str(seed),
    ]
    if semantic:
        argv.append("--semantic")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = benchmark_adaptive.main(argv)
    if rc != 0:
        return {"dataset": dataset, "semantic": semantic, "error": f"rc={rc}"}
    return json.loads(buf.getvalue())


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=20)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--datasets",
        default="astronomy,capitals,rivers",
        help="comma-separated corpus names",
    )
    p.add_argument(
        "--semantic-only",
        action="store_true",
        help="skip the random-embedding legs (reference flag)",
    )
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    cases = []
    for ds in [d.strip() for d in args.datasets.split(",") if d.strip()]:
        for semantic in (True,) if args.semantic_only else (False, True):
            cases.append((ds, semantic))

    results = [
        run_case(ds, semantic, args.trials, args.k, args.seed)
        for ds, semantic in cases
    ]
    out = {
        "suite": "adaptive",
        "trials": args.trials,
        "k": args.k,
        "cases": results,
        "summary": [
            {
                "dataset": r.get("dataset"),
                "semantic": r.get("semantic"),
                "default_test_f1": r.get("default", {}).get("test_f1"),
                "tuned_test_f1": r.get("tuned", {}).get("test_f1"),
            }
            for r in results
        ],
    }
    text = json.dumps(out, indent=2)
    if args.out:
        open(args.out, "w").write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
