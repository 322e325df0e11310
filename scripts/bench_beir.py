"""BEIR rerank harness (reference scripts/bench_beir.py:55-151): cosine top-K
candidate retrieval, then Oscillink rerank of the candidates; nDCG@10 /
Recall@50.

Datasets: uses the `beir` package loader when installed, else a native
reader of the same GenericDataLoader folder format (corpus.jsonl /
queries.jsonl / qrels/test.tsv) — this image has no egress, so the vendored
minicorpus converted by scripts/make_beir_dataset.py exercises the real
BEIR path.  `--synthetic` remains as a loaderless self-check.

  python scripts/make_beir_dataset.py
  python scripts/bench_beir.py --dataset minicorpus \
      --data-dir benchmarks/data/beir --embed lsa --n-queries 52
  python scripts/bench_beir.py --synthetic
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys

import numpy as np


def _dcg(rels):
    return sum(r / np.log2(i + 2) for i, r in enumerate(rels))


def ndcg_at_k(ranked_ids, qrels, k=10):
    rels = [qrels.get(doc, 0) for doc in ranked_ids[:k]]
    ideal = sorted(qrels.values(), reverse=True)[:k]
    idcg = _dcg(ideal)
    return _dcg(rels) / idcg if idcg > 0 else 0.0


def recall_at_k(ranked_ids, qrels, k=50):
    rel = {d for d, r in qrels.items() if r > 0}
    if not rel:
        return 0.0
    return len(set(ranked_ids[:k]) & rel) / len(rel)


def rerank_with_lattice(
    doc_vecs, qvec, candidates, kneighbors=8, lamC=0.5, lamQ=4.0
):
    """Rerank candidate rows by settled alignment (the rerank mode).

    `bundle(diversify=False)` returns the pure score ordering; the MMR
    bundle is a diversity contract and costs ~0.25 nDCG@10 when consumed
    as a relevance ranking (benchmarks/quality_real_lsa_latest.json)."""
    from oscillink_tpu import OscillinkLattice

    Y = doc_vecs[candidates].astype(np.float32)
    lat = OscillinkLattice(
        Y,
        kneighbors=min(kneighbors, len(candidates) - 1),
        lamC=lamC,
        lamQ=lamQ,
    )
    lat.set_query(qvec.astype(np.float32))
    lat.settle(max_iters=12, tol=1e-3)
    order = [
        int(e["id"])
        for e in lat.bundle(k=len(candidates), alpha=0.0, diversify=False)
    ]
    return [candidates[i] for i in order]


def run_synthetic(args):
    """Self-check: topical clusters with known relevance; rerank must keep
    nDCG within noise of the cosine baseline on clean embeddings."""
    rng = np.random.default_rng(args.seed)
    n_docs, d, n_queries = args.n_docs, args.d, args.n_queries
    n_topics = 16
    topics = rng.standard_normal((n_topics, d)).astype(np.float32)
    assign = rng.integers(0, n_topics, size=n_docs)
    docs = topics[assign] + 0.6 * rng.standard_normal((n_docs, d)).astype(np.float32)
    doc_ids = [f"d{i}" for i in range(n_docs)]

    cos_scores, lat_scores = [], []
    for qi in range(n_queries):
        t = int(rng.integers(0, n_topics))
        qvec = topics[t] + 0.3 * rng.standard_normal(d).astype(np.float32)
        qrels = {doc_ids[i]: 1 for i in range(n_docs) if assign[i] == t}
        dn = docs / (np.linalg.norm(docs, axis=1, keepdims=True) + 1e-9)
        qn = qvec / (np.linalg.norm(qvec) + 1e-9)
        sims = dn @ qn
        cand = np.argsort(-sims)[: args.candidates].tolist()
        cos_ranked = [doc_ids[i] for i in cand]
        cos_scores.append(ndcg_at_k(cos_ranked, qrels, 10))
        rr = rerank_with_lattice(docs, qvec, cand)
        lat_ranked = [doc_ids[i] for i in rr]
        lat_scores.append(ndcg_at_k(lat_ranked, qrels, 10))

    return {
        "mode": "synthetic",
        "queries": n_queries,
        "cosine_ndcg@10": float(np.mean(cos_scores)),
        "oscillink_ndcg@10": float(np.mean(lat_scores)),
    }


def load_beir_folder(folder, split="test"):
    """Native BEIR GenericDataLoader-format reader (corpus.jsonl /
    queries.jsonl / qrels/<split>.tsv) so the real BEIR code path runs
    without the `beir` package (this image has no egress).  Returns the
    same (corpus, queries, qrels) triple GenericDataLoader.load() does."""
    corpus = {}
    with open(os.path.join(folder, "corpus.jsonl")) as f:
        for ln in f:
            d = json.loads(ln)
            corpus[str(d["_id"])] = {
                "title": d.get("title", ""), "text": d.get("text", "")
            }
    queries = {}
    with open(os.path.join(folder, "queries.jsonl")) as f:
        for ln in f:
            q = json.loads(ln)
            queries[str(q["_id"])] = q["text"]
    qrels = {}
    with open(os.path.join(folder, "qrels", f"{split}.tsv")) as f:
        header = f.readline()
        assert "query-id" in header, f"unexpected qrels header: {header!r}"
        for ln in f:
            qid, did, score = ln.rstrip("\n").split("\t")
            qrels.setdefault(qid, {})[did] = int(score)
    # only evaluate queries that have judgments, like the beir loader
    queries = {qid: t for qid, t in queries.items() if qid in qrels}
    return corpus, queries, qrels


def _embed_corpus(texts, mode):
    """`hash`: reference text.py hash-embedding contract; `lsa`: real
    learned co-occurrence embeddings fit on the corpus (adapters/lsa.py).
    Returns (embed_fn, doc_vecs) where embed_fn handles query texts."""
    if mode == "lsa":
        from oscillink_tpu.adapters.lsa import LSAEmbedder

        emb = LSAEmbedder(dim=64)
        doc_vecs = emb.fit(texts).astype(np.float32)
        return (lambda ts: emb.embed(ts).astype(np.float32)), doc_vecs
    from oscillink_tpu.adapters.text import embed_texts

    return embed_texts, embed_texts(texts)


def run_beir(args):
    folder = f"{args.data_dir}/{args.dataset}"
    try:  # pragma: no cover — beir not installed on this image
        from beir.datasets.data_loader import GenericDataLoader  # type: ignore

        corpus, queries, qrels = GenericDataLoader(data_folder=folder).load(
            split="test"
        )
    except ImportError:
        corpus, queries, qrels = load_beir_folder(folder)

    doc_ids = list(corpus.keys())
    embed_fn, doc_vecs = _embed_corpus(
        [corpus[d].get("title", "") + " " + corpus[d].get("text", "")
         for d in doc_ids],
        args.embed,
    )
    results = {"cosine": [], "oscillink": [], "recall50": [], "cos_recall50": []}
    for qid, qtext in list(queries.items())[: args.n_queries]:
        qvec = embed_fn([qtext])[0]
        dn = doc_vecs / (np.linalg.norm(doc_vecs, axis=1, keepdims=True) + 1e-9)
        sims = dn @ (qvec / (np.linalg.norm(qvec) + 1e-9))
        cand = np.argsort(-sims)[: args.candidates].tolist()
        rel = {d: int(r) for d, r in qrels.get(qid, {}).items()}
        cos_ranked = [doc_ids[i] for i in cand]
        rr = rerank_with_lattice(doc_vecs, qvec, cand)
        lat_ranked = [doc_ids[i] for i in rr]
        results["cosine"].append(ndcg_at_k(cos_ranked, rel, 10))
        results["oscillink"].append(ndcg_at_k(lat_ranked, rel, 10))
        results["recall50"].append(recall_at_k(lat_ranked, rel, 50))
        results["cos_recall50"].append(recall_at_k(cos_ranked, rel, 50))
    return {
        "mode": "beir",
        "dataset": args.dataset,
        "embed": args.embed,
        "queries": len(results["cosine"]),
        "candidates": args.candidates,
        "cosine_ndcg@10": float(np.mean(results["cosine"])),
        "oscillink_ndcg@10": float(np.mean(results["oscillink"])),
        "cosine_recall@50": float(np.mean(results["cos_recall50"])),
        "oscillink_recall@50": float(np.mean(results["recall50"])),
    }


def main(argv=None):
    # retrieval-quality numbers are platform-independent and the per-query
    # solves tiny — default to CPU (utils/platform.py explains why the pin
    # must set env + config together on this image); pinned here, not at
    # import, so library importers (bench_quality_real) choose their own
    from oscillink_tpu.utils.platform import pin_platform

    pin_platform(os.environ.get("OSCILLINK_QUALITY_PLATFORM", "cpu"))

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="scifact")
    p.add_argument("--data-dir", default="./beir_data")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--embed", default="hash", choices=["hash", "lsa"],
                   help="document/query embedder for --dataset mode")
    p.add_argument("--candidates", type=int, default=50)
    p.add_argument("--n-queries", type=int, default=20)
    p.add_argument("--n-docs", type=int, default=2000)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    result = run_synthetic(args) if args.synthetic else run_beir(args)
    if result is None:
        return 2
    text = json.dumps(result, indent=2)
    if args.out:
        open(args.out, "w").write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
