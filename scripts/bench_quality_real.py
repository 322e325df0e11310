"""Retrieval-quality evidence on REAL text with REAL learned embeddings.

The egress-free counterpart of the reference's quality studies, run on a
vendored hand-written factual corpus (benchmarks/data/minicorpus.jsonl — 26
topics x 5 true passages + 1 plausible-but-false trap each, 2 queries per
topic) embedded with an
LSA model trained on the corpus itself (oscillink_tpu/adapters/lsa.py —
TF-IDF + SVD: real linguistic co-occurrence structure, NOT hash
projections).  Two studies:

1. **Hallucination gating** (reference scripts/proof_hallucination.py
   protocol: labeled traps get gate=trap_gate, mild off-topic damping,
   optional diffusion multiplier — the reference's headline
   "trap rate 0.70 -> 0.00" is exactly this oracle-gated suppression):
   per topic, candidates = topic docs + off-topic fillers; cosine top-k
   baseline vs gated-lattice bundle; hallucination rate / F1 / trap share.

2. **Ungated rerank** (reference scripts/bench_beir.py shape): cosine
   top-30 candidates -> default lattice bundle rerank; nDCG@10 / recall@5.
   Reported honestly — the reference's own checked-in competitor sample
   (benchmarks/competitor_sample.json: tuned oscillink F1 0.4 vs cosine
   0.6) shows the ungated bundle is not a plain-relevance win either.

  python scripts/bench_quality_real.py --out benchmarks/quality_real_lsa_latest.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU by default: hundreds of tiny (N<=40) solves whose quality numbers
# are platform-independent are latency-bound through a remote-TPU tunnel
# (~2 min eval becomes >9 min).  Set OSCILLINK_QUALITY_PLATFORM to run it
# elsewhere deliberately.  pin_platform sets env + config together — see
# its docstring for why both are required on this image.
from oscillink_tpu.utils.platform import pin_platform  # noqa: E402

pin_platform(os.environ.get("OSCILLINK_QUALITY_PLATFORM", "cpu"))

import argparse
import json

import numpy as np

from bench_beir import ndcg_at_k, recall_at_k

_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "benchmarks", "data")


def load_corpus():
    docs = [json.loads(ln) for ln in open(os.path.join(_DATA, "minicorpus.jsonl"))]
    queries = [json.loads(ln) for ln in open(os.path.join(_DATA, "miniqueries.jsonl"))]
    return docs, queries


def _f1(pred, gt):
    tp = len(set(pred) & gt)
    prec = tp / len(pred) if pred else 0.0
    rec = tp / len(gt) if gt else 0.0
    return 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0


def gated_study(docs, queries, Y, emb, *, k=5, trap_gate=0.01, offtopic_gate=0.6,
                use_diffusion=True, seed=0, alpha=0.0, allow_threshold=0.1):
    """Reference proof_hallucination protocol on real text: labeled traps are
    gated down (oracle gating — the reference's own study design), off-topic
    docs mildly damped, optional diffusion multiplier, and the reference's
    allow-threshold sub-lattice step (reference proof_hallucination.py:198-223:
    nodes whose gate falls at or below ``allow_threshold`` are excluded from
    the lattice entirely and the bundle runs on the allowed sub-lattice).

    Both bundle modes are reported: ``lattice`` is the reference contract
    (MMR-diversified bundle) and ``lattice_rerank`` is bundle(diversify=False)
    — the pure settled-alignment ranking a relevance consumer should use."""
    from oscillink_tpu import OscillinkLattice
    from oscillink_tpu.preprocess.diffusion import compute_diffusion_gates

    rng = np.random.default_rng(seed)
    by_topic = {}
    for i, d in enumerate(docs):
        by_topic.setdefault(d["topic"], []).append(i)

    rows = []
    for q in queries:
        topic_rows = by_topic[q["topic"]]
        # candidate set: the topic's 6 docs + 12 random off-topic fillers
        others = [i for t, rr in by_topic.items() if t != q["topic"] for i in rr]
        fill = list(rng.choice(others, size=12, replace=False))
        cand = topic_rows + fill
        Yc = Y[cand].astype(np.float32)
        qv = emb.embed([q["text"]])[0]

        local_gt = {j for j, i in enumerate(cand) if not docs[i]["trap"]
                    and docs[i]["topic"] == q["topic"]}
        local_traps = {j for j, i in enumerate(cand) if docs[i]["trap"]
                       and docs[i]["topic"] == q["topic"]}

        sims = Yc @ qv
        pred_base = list(np.argsort(-sims)[:k])

        kn = min(6, len(cand) - 1)
        gates = np.ones(len(cand), dtype=np.float32)
        for j in range(len(cand)):
            if j in local_traps:
                gates[j] = min(gates[j], trap_gate)
            elif j not in local_gt:
                gates[j] = min(gates[j], offtopic_gate)
        if use_diffusion:
            try:
                diff = compute_diffusion_gates(Yc, qv, kneighbors=kn,
                                               beta=1.5, gamma=0.1)
                gates = (gates * diff).astype(np.float32)
            except Exception:
                pass

        # reference allow-threshold sub-lattice (proof_hallucination.py:198-223)
        allowed = np.nonzero(gates > allow_threshold)[0]
        if 1 < len(allowed) < len(cand):
            Ys, gs = Yc[allowed], gates[allowed]
            ks = min(kn, max(1, len(allowed) - 1))
            idx_map = allowed
        else:
            Ys, gs, ks, idx_map = Yc, gates, kn, np.arange(len(cand))

        # one lattice + settle serves both bundle modes (diversify only
        # affects the bundle call, not the solve)
        lat = OscillinkLattice(Ys, kneighbors=ks, lamQ=2.0)
        lat.set_gates(gs)
        lat.set_query(qv)
        lat.settle(max_iters=12, tol=1e-3)

        def bundle_pred(diversify):
            # alpha=0 = pure gated alignment (reference lattice.py:546
            # documents alpha as the anomaly/alignment trade-off; retrieval
            # wants alignment)
            sel = lat.bundle(k=min(k, len(idx_map)), alpha=alpha,
                             diversify=diversify)
            return [int(idx_map[int(e["id"])]) for e in sel]

        pred_lat = bundle_pred(True)
        pred_rr = bundle_pred(False)

        def metrics(pred):
            tshare = len([j for j in pred if j in local_traps]) / max(1, k)
            return {
                "hallucination": any(j in local_traps for j in pred),
                "f1": _f1(pred, local_gt),
                "trap_share": tshare,
            }

        rows.append({"qid": q["qid"], "baseline": metrics(pred_base),
                     "lattice": metrics(pred_lat),
                     "lattice_rerank": metrics(pred_rr)})

    def agg(side, m):
        vals = [r[side][m] for r in rows]
        return round(float(np.mean(vals)), 4)

    def block(side):
        return {
            "hallucination_rate": agg(side, "hallucination"),
            "f1_mean": agg(side, "f1"),
            "trap_share_mean": agg(side, "trap_share"),
        }

    return {
        "protocol": "reference proof_hallucination.py (oracle trap gates "
        f"{trap_gate}, offtopic {offtopic_gate}, diffusion={use_diffusion}, "
        f"allow_threshold {allow_threshold} sub-lattice, bundle alpha={alpha})",
        "k": k,
        "baseline": block("baseline"),
        "lattice": block("lattice"),
        "lattice_rerank": block("lattice_rerank"),
        "per_query": rows,
    }


def rerank_study(docs, queries, Y, emb, *, topk=30):
    """Ungated bundle rerank of cosine candidates (bench_beir shape)."""
    from oscillink_tpu import OscillinkLattice

    doc_ids = [d["id"] for d in docs]
    by_topic = {}
    for d in docs:
        by_topic.setdefault(d["topic"], []).append(d)

    rows = []
    for q in queries:
        qv = emb.embed([q["text"]])[0]
        qrels = {d["id"]: 1 for d in by_topic[q["topic"]] if not d["trap"]}
        sims = Y @ qv
        order = np.argsort(-sims)
        cos_ranked = [doc_ids[i] for i in order]
        cand = [int(i) for i in order[:topk]]

        Yc = Y[cand].astype(np.float32)
        kn = min(6, len(cand) - 1)
        # best automatic (label-free) config from the tune grid the reference
        # also runs (cloud benchmarks tuned lamC/lamQ): lamQ=0.5 + diffusion
        lat = OscillinkLattice(Yc, kneighbors=kn, lamQ=0.5)
        try:
            from oscillink_tpu.preprocess.diffusion import compute_diffusion_gates

            lat.set_gates(compute_diffusion_gates(Yc, qv, kneighbors=kn,
                                                  beta=1.5, gamma=0.1))
        except Exception:
            pass
        lat.set_query(qv)
        lat.settle(max_iters=12, tol=1e-3)
        sel = [int(e["id"]) for e in lat.bundle(k=10, alpha=0.0)]
        rest = [i for i in range(len(cand)) if i not in sel]
        lat_ranked = [doc_ids[cand[i]] for i in sel + rest]

        # rerank mode: pure settled-alignment ranking (no MMR) — the mode a
        # relevance consumer should use (bundle(diversify=False)).  Ungated,
        # lamQ=1.0: a rerank consumer wants relevance smoothing, not trap
        # suppression (grid: ungated q1.0 0.859 > gated q0.5 0.849 nDCG)
        lat_rr = OscillinkLattice(Yc, kneighbors=kn, lamQ=1.0)
        lat_rr.set_query(qv)
        lat_rr.settle(max_iters=12, tol=1e-3)
        rr = [int(e["id"]) for e in
              lat_rr.bundle(k=len(cand), alpha=0.0, diversify=False)]
        rr_ranked = [doc_ids[cand[i]] for i in rr]

        rows.append({
            "qid": q["qid"],
            "cosine": {"ndcg10": ndcg_at_k(cos_ranked, qrels, 10),
                       "recall5": recall_at_k(cos_ranked, qrels, 5)},
            "oscillink": {"ndcg10": ndcg_at_k(lat_ranked, qrels, 10),
                          "recall5": recall_at_k(lat_ranked, qrels, 5)},
            "oscillink_rerank": {"ndcg10": ndcg_at_k(rr_ranked, qrels, 10),
                                 "recall5": recall_at_k(rr_ranked, qrels, 5)},
        })

    def agg(side, m):
        return round(float(np.mean([r[side][m] for r in rows])), 4)

    return {
        "cosine": {m: agg("cosine", m) for m in ("ndcg10", "recall5")},
        "oscillink": {m: agg("oscillink", m) for m in ("ndcg10", "recall5")},
        "oscillink_rerank": {
            m: agg("oscillink_rerank", m) for m in ("ndcg10", "recall5")
        },
        "note": "oscillink = the MMR-diversified bundle (the reference "
        "contract): it trades plain relevance for diversity BY CONTRACT — "
        "the reference's own competitor_sample.json (tuned oscillink F1 0.4 "
        "vs cosine 0.6) shows the same. oscillink_rerank = "
        "bundle(diversify=False), pure settled-alignment ranking (ungated, "
        "lamQ=1.0): within ~1% of cosine nDCG@10 and at its recall@5 on "
        "this corpus — rerank parity, not a win; the MMR mode costs ~0.25 "
        "nDCG when misused as a relevance ranking, and the cross-validated "
        "tune grid (rerank_cv_tuned) confirms parameter tuning does NOT "
        "generalize to held-out queries. The headline quality claim remains "
        "the gated study above.",
    }


def rerank_cv_study(docs, queries, Y, emb, *, topk=30):
    """Cross-validated tuned rerank (the honest version of the reference's
    tune grid, cloud benchmarks.py:152-207: it tunes lamC/lamQ/k on the SAME
    trials it reports). Two folds over queries; the grid is tuned on one
    fold by nDCG@10 and evaluated on the other; pooled held-out metrics plus
    per-query win/loss/tie vs cosine are reported."""
    import itertools

    from oscillink_tpu import OscillinkLattice

    doc_ids = [d["id"] for d in docs]
    by_topic = {}
    for d in docs:
        by_topic.setdefault(d["topic"], []).append(d)

    # per-query precompute: the embedding, candidate set, and cosine
    # baseline are grid-independent — computing them once per query removes
    # ~1400 redundant embed/argsort/metric evaluations from the CV sweep
    pre = {}
    for q in queries:
        qv = emb.embed([q["text"]])[0]
        qrels = {d["id"]: 1 for d in by_topic[q["topic"]] if not d["trap"]}
        order = np.argsort(-(Y @ qv))
        cand = [int(i) for i in order[:topk]]
        cos_ranked = [doc_ids[i] for i in order]
        pre[q["qid"]] = (
            qv, qrels, cand, Y[cand].astype(np.float32),
            ndcg_at_k(cos_ranked, qrels, 10),
            recall_at_k(cos_ranked, qrels, 5),
        )

    def eval_q(q, lamQ, lamC, kn_):
        qv, qrels, cand, Yc, cos_nd, cos_r5 = pre[q["qid"]]
        kn = min(kn_, len(cand) - 1)
        lat = OscillinkLattice(Yc, kneighbors=kn, lamQ=lamQ, lamC=lamC)
        lat.set_query(qv)
        lat.settle(max_iters=12, tol=1e-3)
        rr = [int(e["id"]) for e in
              lat.bundle(k=len(cand), alpha=0.0, diversify=False)]
        rr_ranked = [doc_ids[cand[i]] for i in rr]
        return (ndcg_at_k(rr_ranked, qrels, 10),
                recall_at_k(rr_ranked, qrels, 5),
                cos_nd, cos_r5)

    grid = list(itertools.product([0.5, 1.0, 2.0], [0.5, 1.0, 2.0], [4, 6, 8]))
    folds = [[q for i, q in enumerate(queries) if i % 2 == 0],
             [q for i, q in enumerate(queries) if i % 2 == 1]]
    pooled, picks = [], []
    for f in range(2):
        tune, test = folds[f], folds[1 - f]
        best, best_nd = None, -1.0
        for lamQ, lamC, kn in grid:
            nd = float(np.mean([eval_q(q, lamQ, lamC, kn)[0] for q in tune]))
            if nd > best_nd:
                best_nd, best = nd, (lamQ, lamC, kn)
        picks.append({"lamQ": best[0], "lamC": best[1], "kneighbors": best[2]})
        pooled.extend(eval_q(q, *best) for q in test)

    rr_nd = [v[0] for v in pooled]
    cos_nd = [v[2] for v in pooled]
    wins = sum(1 for a, b in zip(rr_nd, cos_nd) if a > b + 1e-9)
    losses = sum(1 for a, b in zip(rr_nd, cos_nd) if a < b - 1e-9)
    return {
        "protocol": "2-fold cross-validation: lamQ/lamC/kneighbors tuned on "
        "one query fold by nDCG@10, evaluated on the other; pooled held-out "
        "metrics (the reference's cloud tune grid reports tuning-set numbers)",
        "fold_picks": picks,
        "held_out": {
            "rerank": {"ndcg10": round(float(np.mean(rr_nd)), 4),
                       "recall5": round(float(np.mean([v[1] for v in pooled])), 4)},
            "cosine": {"ndcg10": round(float(np.mean(cos_nd)), 4),
                       "recall5": round(float(np.mean([v[3] for v in pooled])), 4)},
            "per_query_ndcg10": {"wins": wins, "losses": losses,
                                 "ties": len(pooled) - wins - losses},
        },
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--out", default="benchmarks/quality_real_lsa_latest.json")
    args = p.parse_args(argv)

    from oscillink_tpu.adapters.lsa import LSAEmbedder

    docs, queries = load_corpus()
    emb = LSAEmbedder(dim=args.dim)
    Y = emb.fit([d["text"] for d in docs])

    gated = gated_study(docs, queries, Y, emb)
    rerank = rerank_study(docs, queries, Y, emb)
    rerank_cv = rerank_cv_study(docs, queries, Y, emb)

    out = {
        "corpus": "benchmarks/data/minicorpus.jsonl (hand-written factual text; "
        f"{len(docs)} passages, {len(queries)} queries, "
        f"{sum(1 for d in docs if d['trap'])} traps)",
        "embeddings": f"LSA (TF-IDF + SVD) dim={args.dim}, trained on the corpus",
        "hallucination_gating": {k: v for k, v in gated.items() if k != "per_query"},
        "ungated_rerank": rerank,
        "rerank_cv_tuned": rerank_cv,
        "reference_baselines": {
            "hallucination_study": "trap 0.70->0.00, F1 0.56->0.66 "
            "(hash embeddings, oracle gates; hallucination_summary.json)",
            "competitor_sample": "tuned oscillink F1 0.4 vs cosine 0.6 "
            "(benchmarks/competitor_sample.json — ungated bundle loses plain F1 "
            "in the reference too)",
        },
        "per_query_gated": gated["per_query"],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"hallucination_gating": out["hallucination_gating"],
                      "ungated_rerank": rerank,
                      "rerank_cv_tuned": rerank_cv}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
