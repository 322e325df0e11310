"""Retrieval-quality parity with CONFIDENCE INTERVALS (round-5 verdict #6).

The round-4 parity claim rested on a 156-passage corpus where
oscillink-rerank scored 0.878 vs cosine 0.880 nDCG@10 — a sample too small
to distinguish -0.002 from -0.02.  This harness runs the reference rerank
protocol (reference scripts/bench_beir.py:55-151: cosine top-C candidates,
lattice rerank of the candidates) on a BEIR-format corpus and reports:

  * paired bootstrap CIs over queries for the (rerank - cosine) nDCG@10
    delta — paired resampling cancels per-query difficulty variance;
  * a tuned-vs-default HELD-OUT protocol: a (kneighbors, lamC, lamQ) grid
    is scored on one query fold, the winner evaluated on the other fold
    (both directions, pooled) — resolving the round-4
    "CV tuning doesn't generalize" open question with a measurement at a
    sample size where generalization is testable.

  python scripts/make_beir_synth.py
  python scripts/bench_beir_ci.py --dataset synth3k \
      --data-dir benchmarks/data/beir --out benchmarks/beir_synth3k_ci.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# quality numbers are platform-independent; hundreds of tiny solves are
# latency-bound through the remote-TPU tunnel — pin CPU (see bench_beir)
from oscillink_tpu.utils.platform import pin_platform  # noqa: E402

pin_platform(os.environ.get("OSCILLINK_QUALITY_PLATFORM", "cpu"))

import argparse
import json

import numpy as np

from bench_beir import (
    _embed_corpus,
    load_beir_folder,
    ndcg_at_k,
    recall_at_k,
    rerank_with_lattice,
)

GRID = [
    {"kneighbors": k, "lamC": lc, "lamQ": lq}
    for k in (4, 8, 12)
    for lc in (0.5, 2.0)
    for lq in (1.0, 4.0)
]
DEFAULT = {"kneighbors": 8, "lamC": 0.5, "lamQ": 4.0}


def bootstrap_ci(values, b=4000, seed=0, alpha=0.05):
    """Percentile bootstrap CI for the mean of ``values``."""
    rng = np.random.default_rng(seed)
    v = np.asarray(values, dtype=np.float64)
    idx = rng.integers(0, len(v), size=(b, len(v)))
    means = v[idx].mean(axis=1)
    lo, hi = np.quantile(means, [alpha / 2, 1 - alpha / 2])
    return float(v.mean()), float(lo), float(hi)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synth3k")
    p.add_argument("--data-dir", default="benchmarks/data/beir")
    p.add_argument("--embed", default="lsa", choices=["hash", "lsa"])
    p.add_argument("--candidates", type=int, default=50)
    p.add_argument("--n-queries", type=int, default=0, help="0 = all")
    p.add_argument("--bootstrap", type=int, default=4000)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    folder = os.path.join(args.data_dir, args.dataset)
    corpus, queries, qrels = load_beir_folder(folder)
    doc_ids = list(corpus.keys())
    embed_fn, doc_vecs = _embed_corpus(
        [corpus[d].get("title", "") + " " + corpus[d].get("text", "")
         for d in doc_ids],
        args.embed,
    )
    dn = doc_vecs / (np.linalg.norm(doc_vecs, axis=1, keepdims=True) + 1e-9)

    qitems = list(queries.items())
    if args.n_queries:
        qitems = qitems[: args.n_queries]

    # per-query candidates + cosine baseline (shared across all arms)
    cands, qvecs, rels = [], [], []
    cos_ndcg, cos_rec = [], []
    for qid, qtext in qitems:
        qvec = embed_fn([qtext])[0]
        sims = dn @ (qvec / (np.linalg.norm(qvec) + 1e-9))
        cand = np.argsort(-sims)[: args.candidates].tolist()
        rel = {d: int(r) for d, r in qrels.get(qid, {}).items()}
        cands.append(cand)
        qvecs.append(qvec)
        rels.append(rel)
        ranked = [doc_ids[i] for i in cand]
        cos_ndcg.append(ndcg_at_k(ranked, rel, 10))
        cos_rec.append(recall_at_k(ranked, rel, 50))
    nq = len(qitems)
    print(f"# {nq} queries, {len(doc_ids)} docs, embed={args.embed}", flush=True)

    def eval_config(cfg, subset=None):
        ndcgs, recs = [], []
        qs = range(nq) if subset is None else subset
        for qi in qs:
            rr = rerank_with_lattice(doc_vecs, qvecs[qi], cands[qi], **cfg)
            ranked = [doc_ids[i] for i in rr]
            ndcgs.append(ndcg_at_k(ranked, rels[qi], 10))
            recs.append(recall_at_k(ranked, rels[qi], 50))
        return ndcgs, recs

    # default-config arm on every query
    def_ndcg, def_rec = eval_config(DEFAULT)
    print(f"# default {DEFAULT}: ndcg@10 {np.mean(def_ndcg):.4f}", flush=True)

    # full grid on every query (re-used for the held-out protocol)
    grid_scores = {}
    for cfg in GRID:
        key = json.dumps(cfg, sort_keys=True)
        nd, _ = eval_config(cfg)
        grid_scores[key] = nd
        print(f"# grid {key}: ndcg@10 {np.mean(nd):.4f}", flush=True)

    # held-out tuned arm: pick the grid winner on fold A, score on fold B
    fold_a = list(range(0, nq, 2))
    fold_b = list(range(1, nq, 2))
    tuned_heldout = np.zeros(nq)
    picks = []
    for train, test in ((fold_a, fold_b), (fold_b, fold_a)):
        best = max(
            grid_scores,
            key=lambda k: float(np.mean([grid_scores[k][i] for i in train])),
        )
        picks.append(json.loads(best))
        for i in test:
            tuned_heldout[i] = grid_scores[best][i]

    cos = np.asarray(cos_ndcg)
    dflt = np.asarray(def_ndcg)
    b = args.bootstrap
    mean_d, lo_d, hi_d = bootstrap_ci(dflt - cos, b=b, seed=1)
    mean_t, lo_t, hi_t = bootstrap_ci(tuned_heldout - cos, b=b, seed=2)
    best_fixed = max(grid_scores, key=lambda k: float(np.mean(grid_scores[k])))
    mean_bf, lo_bf, hi_bf = bootstrap_ci(
        np.asarray(grid_scores[best_fixed]) - cos, b=b, seed=3
    )

    result = {
        "dataset": args.dataset,
        "embed": args.embed,
        "queries": nq,
        "docs": len(doc_ids),
        "candidates": args.candidates,
        "bootstrap_resamples": b,
        "cosine": {
            "ndcg@10": round(float(cos.mean()), 4),
            "ndcg@10_ci95": [round(v, 4) for v in bootstrap_ci(cos, b=b, seed=4)[1:]],
            "recall@50": round(float(np.mean(cos_rec)), 4),
        },
        "oscillink_rerank_default": {
            "config": DEFAULT,
            "ndcg@10": round(float(dflt.mean()), 4),
            "ndcg@10_ci95": [round(v, 4) for v in bootstrap_ci(dflt, b=b, seed=5)[1:]],
            "recall@50": round(float(np.mean(def_rec)), 4),
            "delta_vs_cosine": round(mean_d, 4),
            "delta_ci95": [round(lo_d, 4), round(hi_d, 4)],
        },
        "oscillink_rerank_tuned_heldout": {
            "protocol": "2-fold: grid winner on one fold scored on the other",
            "fold_picks": picks,
            "ndcg@10": round(float(tuned_heldout.mean()), 4),
            "delta_vs_cosine": round(mean_t, 4),
            "delta_ci95": [round(lo_t, 4), round(hi_t, 4)],
        },
        "best_fixed_config_insample": {
            "config": json.loads(best_fixed),
            "ndcg@10": round(float(np.mean(grid_scores[best_fixed])), 4),
            "delta_vs_cosine": round(mean_bf, 4),
            "delta_ci95": [round(lo_bf, 4), round(hi_bf, 4)],
        },
        "grid_ndcg@10": {
            k: round(float(np.mean(v)), 4) for k, v in grid_scores.items()
        },
    }
    text = json.dumps(result, indent=2)
    if args.out:
        open(args.out, "w").write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
