#!/usr/bin/env python3
"""Uniform vs diffusion gating comparison (reference
scripts/benchmark_gating_compare.py contract).

Per trial: settle ms, receipt ms, deltaH, mean bundle alignment for both
modes; JSON summary with per-trial detail.

  python scripts/benchmark_gating_compare.py --N 1200 --D 128 \
      --kneighbors 8 --trials 3 --gamma 0.15 --beta 1.0 --json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oscillink_tpu.utils.platform import pin_platform  # noqa: E402

pin_platform(os.environ.get("OSCILLINK_QUALITY_PLATFORM", "cpu"))

import argparse
import json
import time

import numpy as np


def run_trial(N, D, kneighbors, beta, gamma, bundle_k, seed, gated: bool):
    from oscillink_tpu import OscillinkLattice, compute_diffusion_gates

    rng = np.random.default_rng(seed)
    Y = rng.normal(size=(N, D)).astype(np.float32)
    psi = rng.normal(size=(D,)).astype(np.float32)

    lat = OscillinkLattice(Y, kneighbors=kneighbors)
    lat.set_query(psi)
    gate_ms = 0.0
    if gated:
        t0 = time.perf_counter()
        gates = compute_diffusion_gates(
            Y, psi, kneighbors=kneighbors, beta=beta, gamma=gamma,
        )
        gate_ms = 1000.0 * (time.perf_counter() - t0)
        lat.set_gates(gates)
    t0 = time.perf_counter()
    lat.settle()
    settle_ms = 1000.0 * (time.perf_counter() - t0)
    t0 = time.perf_counter()
    rec = lat.receipt()
    receipt_ms = 1000.0 * (time.perf_counter() - t0)
    bundle = lat.bundle(k=bundle_k)
    return {
        "settle_ms": round(settle_ms, 2),
        "receipt_ms": round(receipt_ms, 2),
        "gate_ms": round(gate_ms, 2),
        "deltaH": float(rec["deltaH_total"]),
        "mean_alignment": float(np.mean([e["align"] for e in bundle]))
        if bundle else 0.0,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=1200)
    p.add_argument("--D", type=int, default=128)
    p.add_argument("--kneighbors", type=int, default=8)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.15)
    p.add_argument("--bundle-k", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    detail = {"uniform": [], "diffusion": []}
    for t in range(args.trials):
        seed = args.seed + t
        detail["uniform"].append(run_trial(
            args.N, args.D, args.kneighbors, args.beta, args.gamma,
            args.bundle_k, seed, gated=False))
        detail["diffusion"].append(run_trial(
            args.N, args.D, args.kneighbors, args.beta, args.gamma,
            args.bundle_k, seed, gated=True))

    def mean(mode, key):
        return round(float(np.mean([r[key] for r in detail[mode]])), 3)

    out = {
        "config": vars(args),
        "summary": {
            mode: {
                "mean_settle_ms": mean(mode, "settle_ms"),
                "mean_receipt_ms": mean(mode, "receipt_ms"),
                "mean_gate_ms": mean(mode, "gate_ms"),
                "mean_deltaH": mean(mode, "deltaH"),
                "mean_alignment": mean(mode, "mean_alignment"),
            }
            for mode in ("uniform", "diffusion")
        },
        "trials": detail,
    }
    text = json.dumps(out, indent=2)
    if args.out:
        open(args.out, "w").write(text)
    print(text if args.json else out["summary"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
