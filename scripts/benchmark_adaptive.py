"""Adaptive parameter tuning benchmark (reference scripts/benchmark_adaptive.py
+ bench_adaptive_suite.py): grid-search lamC/lamQ/k on a tune split, evaluate
the winner on a held-out test split, compare against defaults.

  python scripts/benchmark_adaptive.py --trials 10 --k 3 --out adaptive.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys

import numpy as np


def _one_trial(Y, psi, gt_ids, trap_ids, k, params):
    from oscillink_tpu import OscillinkLattice

    lat = OscillinkLattice(
        Y,
        kneighbors=min(int(params.get("kneighbors", 6)), max(1, Y.shape[0] - 1)),
        lamG=params.get("lamG", 1.0),
        lamC=params.get("lamC", 0.5),
        lamQ=params.get("lamQ", 4.0),
        deterministic_k=True,
    )
    lat.set_query(psi)
    lat.settle(max_iters=12, tol=1e-3)
    pred = [int(e["id"]) for e in lat.bundle(k=k)]
    tp = len([i for i in pred if i in gt_ids])
    fp = len([i for i in pred if i not in gt_ids])
    fn = len([i for i in gt_ids if i not in pred])
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 0.0 if prec == 0.0 and rec == 0.0 else 2 * prec * rec / (prec + rec)
    return f1, any(i in trap_ids for i in pred)


def _make_trial_data(rng, n, d, n_facts, n_traps):
    Y = rng.standard_normal((n, d)).astype(np.float32)
    ids = rng.permutation(n)
    gt = set(map(int, ids[:n_facts]))
    traps = set(map(int, ids[n_facts : n_facts + n_traps]))
    q_idx = min(gt)
    psi = (Y[q_idx] / (np.linalg.norm(Y[q_idx]) + 1e-9)).astype(np.float32)
    return Y, psi, gt, traps


def _make_corpus_trial_data(rng, dataset, d, semantic):
    """Text-corpus trial (reference benchmark_adaptive.py --dataset mars|paris):
    fixed fact/trap labels, per-trial embeddings (random unless --semantic,
    which uses the deterministic hash embedder so runs are comparable)."""
    from proof_hallucination import CORPORA, _embed

    corpus = CORPORA[dataset]
    texts = [t for t, _ in corpus]
    gt = {i for i, (_, kind) in enumerate(corpus) if kind == "fact"}
    traps = {i for i, (_, kind) in enumerate(corpus) if kind == "trap"}
    Y = _embed(texts, d, semantic, rng)
    q_idx = min(gt)
    psi = (Y[q_idx] / (np.linalg.norm(Y[q_idx]) + 1e-9)).astype(np.float32)
    return Y, psi, gt, traps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=10)
    p.add_argument("--n", type=int, default=60)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--n-facts", type=int, default=5)
    p.add_argument("--n-traps", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--dataset",
        default="synthetic",
        choices=["synthetic", "astronomy", "capitals", "rivers"],
        help="synthetic random trials, or a labeled text corpus "
        "(proof_hallucination.CORPORA; the reference's mars/paris analog)",
    )
    p.add_argument(
        "--semantic",
        action="store_true",
        help="content-hash embeddings instead of per-trial random "
        "(reference --semantic)",
    )
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    grid = [
        {"lamC": 0.5 * cs, "lamQ": 4.0 * qs, "kneighbors": kk}
        for cs in (0.6, 1.0, 1.4)
        for qs in (0.5, 1.0, 1.5)
        for kk in (4, 6, 8)
    ]
    rng = np.random.default_rng(args.seed)
    n_tune = max(1, args.trials // 2)

    if args.dataset == "synthetic":

        def make(r):
            return _make_trial_data(r, args.n, args.d, args.n_facts, args.n_traps)

    else:

        def make(r):
            return _make_corpus_trial_data(r, args.dataset, args.d, args.semantic)

    tune_data = [make(rng) for _ in range(n_tune)]
    test_data = [make(rng) for _ in range(args.trials - n_tune)]

    def avg_f1(params, data):
        scores = [_one_trial(Y, psi, gt, traps, args.k, params)[0] for Y, psi, gt, traps in data]
        return float(np.mean(scores)) if scores else 0.0

    best_params, best_score = {}, avg_f1({}, tune_data)
    default_score = best_score
    for params in grid:
        s = avg_f1(params, tune_data)
        if s > best_score:
            best_params, best_score = params, s

    result = {
        "dataset": args.dataset,
        "semantic": bool(args.semantic),
        "grid_size": len(grid),
        "tune_trials": n_tune,
        "test_trials": len(test_data),
        "default": {"tune_f1": default_score, "test_f1": avg_f1({}, test_data)},
        "tuned": {
            "params": best_params,
            "tune_f1": best_score,
            "test_f1": avg_f1(best_params, test_data),
        },
    }
    text = json.dumps(result, indent=2)
    if args.out:
        open(args.out, "w").write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
