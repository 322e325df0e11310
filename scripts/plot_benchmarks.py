"""Render benchmark charts (reference scripts/plot_benchmarks.py): scale-sweep
JSONL -> PNG. Gated on matplotlib availability (not baked into this image).

  python scripts/plot_benchmarks.py --scale benchmarks/scale_latest.jsonl --out assets/
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
from collections import defaultdict


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="benchmarks/scale_latest.jsonl")
    p.add_argument("--out", default="assets")
    args = p.parse_args(argv)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        print("matplotlib not installed; skipping plots", file=sys.stderr)
        return 0

    rows = [json.loads(line) for line in open(args.scale) if line.strip()]
    by_n = defaultdict(lambda: defaultdict(list))
    for r in rows:
        for key in ("graph_build_ms", "last_settle_ms", "ustar_solve_ms"):
            by_n[r["N"]][key].append(r[key])

    import os

    os.makedirs(args.out, exist_ok=True)
    ns = sorted(by_n)
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for key, label in (
        ("graph_build_ms", "graph build"),
        ("last_settle_ms", "settle"),
        ("ustar_solve_ms", "U* solve"),
    ):
        means = [sum(by_n[n][key]) / len(by_n[n][key]) for n in ns]
        ax.plot(ns, means, marker="o", label=label)
    ax.set_xlabel("N (nodes)")
    ax.set_ylabel("ms")
    ax.set_title("oscillink-tpu scale sweep")
    ax.legend()
    ax.set_xscale("log")
    ax.set_yscale("log")
    out = f"{args.out}/scale_sweep.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
