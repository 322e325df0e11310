#!/usr/bin/env python3
"""Drop-in RAG upgrade: cosine top-k retrieval vs a settled lattice bundle.

A plain RAG pipeline ranks documents by cosine similarity to the query and
ships the top-k straight to the model — so a "trap" document (high lexical
similarity, wrong claim) sails through.  The lattice settles the corpus
against the query first, so selection is scored by *coherence with the
retrieved neighborhood*, not raw similarity, and every answer carries an
auditable ΔH receipt (reference analog: examples/rag_replacement.py).

Run: python examples/rag_replacement.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oscillink_tpu import Oscillink
from oscillink_tpu.adapters.text import embed_texts

DOCS = [
    # on-topic cluster: lattice facts
    "The lattice settles embeddings into a coherent state before retrieval.",
    "Settling minimizes a convex energy over the mutual-kNN graph.",
    "Receipts record the energy drop deltaH for every settle.",
    "The coherence bundle ranks nodes by settled alignment, not raw cosine.",
    "Null points flag anomalous edges whose residual z-score exceeds 3.",
    # related but secondary cluster: deployment
    "The service exposes settle and receipt endpoints over HTTP.",
    "Receipts can be HMAC-signed for downstream verification.",
    "Quota headers report remaining node-dim units per key.",
    # traps: lexically close to the query, semantically wrong
    "The lattice settles nothing and retrieval is random noise.",
    "Energy receipts are decorative and deltaH means nothing.",
    # distractors
    "Bread dough rises faster in a warm kitchen.",
    "Migrating geese navigate by the earth's magnetic field.",
]
TRAPS = {8, 9}
QUERY = "How does lattice settling improve retrieval coherence and receipts?"


def cosine_topk(emb: np.ndarray, q: np.ndarray, k: int) -> list[int]:
    en = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
    qn = q / (np.linalg.norm(q) + 1e-12)
    return list(np.argsort(-(en @ qn))[:k])


def lattice_bundle(emb: np.ndarray, q: np.ndarray, k: int) -> dict:
    lat = Oscillink(emb, kneighbors=4, deterministic_k=True)
    lat.set_query(q.astype(np.float32))
    info = lat.settle(max_iters=12, tol=1e-3)
    rec = lat.receipt()
    picks = lat.bundle(k=k)
    return {
        "ids": [p["id"] for p in picks],
        "deltaH": rec["deltaH_total"],
        "settle_ms": info["t_ms"],
        "nulls": len(rec["null_points"]),
        "state_sig": rec["meta"]["state_sig"][:16],
    }


def main() -> None:
    k = 5
    emb = embed_texts(DOCS)
    q = embed_texts([QUERY])[0]
    # pull the traps toward the query in embedding space (the classic
    # lexical-overlap failure mode hash/encoder embeddings both exhibit)
    for t in TRAPS:
        emb[t] = 0.45 * emb[t] + 0.55 * q
        emb[t] /= np.linalg.norm(emb[t]) + 1e-12

    base = cosine_topk(emb, q, k)
    out = lattice_bundle(emb, q, k)
    # pure-relevance rerank mode: no MMR diversity trade — use this when
    # you want a ranking, not diverse coverage (holds cosine-parity nDCG;
    # see benchmarks/quality_real_lsa_latest.json)
    lat_rr = Oscillink(emb, kneighbors=4, deterministic_k=True)
    lat_rr.set_query(q.astype(np.float32))
    lat_rr.settle(max_iters=12, tol=1e-3)
    rerank = [p["id"] for p in lat_rr.bundle(k=k, alpha=0.0, diversify=False)]

    def fmt(ids):
        return ", ".join(f"{i}{'*' if i in TRAPS else ''}" for i in ids)

    print(f"query: {QUERY!r}")
    print(f"cosine top-{k}:   [{fmt(base)}]  (* = trap)")
    print(f"lattice bundle:  [{fmt(out['ids'])}]")
    print(f"lattice rerank:  [{fmt(rerank)}]")
    print(
        "   (bundle = coherence + diversity, suppresses traps; rerank = "
        "pure relevance order, tracks cosine — pick per consumer)"
    )
    base_traps = sum(i in TRAPS for i in base)
    latt_traps = sum(i in TRAPS for i in out["ids"])
    print(f"traps retrieved: cosine={base_traps}  lattice={latt_traps}")
    print(
        f"audit: deltaH={out['deltaH']:.2f}  settle={out['settle_ms']:.1f} ms  "
        f"nulls={out['nulls']}  state_sig={out['state_sig']}…"
    )
    assert latt_traps <= base_traps, "lattice must not retrieve more traps"


if __name__ == "__main__":
    main()
