"""Generate an egress-free 3k-document BEIR-format corpus with GRADED qrels.

The vendored hand-written minicorpus (156 passages) is too small to
distinguish a -0.002 nDCG delta from -0.02 (round-4 verdict): bootstrap CIs
over 52 queries on 6-doc relevance sets span ~0.05.  This generator builds a
corpus big enough for meaningful intervals while keeping REAL lexical
co-occurrence structure for the LSA embedder (adapters/lsa.py):

  * 40 topics, each with its own term vocabulary (12 terms), split into
    6 aspects x 8 aspect-specific terms;
  * documents (default 3000) sample a (topic, aspect) pair and draw tokens
    ~40% topic terms / 25% aspect terms / 35% shared filler, so topical
    similarity is carried by word choice exactly as in real text;
  * 10% of documents are cross-topic "noise" mixing two topics (realistic
    hard negatives);
  * queries (default 180) target a (topic, aspect) pair with a short
    topic+aspect phrase;
  * GRADED qrels in the BEIR convention: same (topic, aspect) -> 2,
    same topic other aspect -> 1, else unjudged (0).

Reference contract: scripts/bench_beir.py:55-151 (BEIR GenericDataLoader
folder layout: corpus.jsonl / queries.jsonl / qrels/test.tsv).

  python scripts/make_beir_synth.py   # writes benchmarks/data/beir/synth3k/
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# deterministic pseudo-vocabulary: syllable products give LSA real tokens
# without any external wordlist (no egress)
_ONSETS = ["b", "br", "c", "cr", "d", "dr", "f", "fl", "g", "gl", "h", "j",
           "k", "kl", "l", "m", "n", "p", "pr", "qu", "r", "s", "st", "t",
           "tr", "v", "w", "z"]
_NUCLEI = ["a", "e", "i", "o", "u", "ae", "ia", "ou"]
_CODAS = ["", "n", "r", "s", "t", "l", "x", "m"]


def _wordlist(rng: np.random.Generator, n: int) -> list[str]:
    words, seen = [], set()
    while len(words) < n:
        w = (
            _ONSETS[rng.integers(len(_ONSETS))]
            + _NUCLEI[rng.integers(len(_NUCLEI))]
            + _CODAS[rng.integers(len(_CODAS))]
            + _ONSETS[rng.integers(len(_ONSETS))]
            + _NUCLEI[rng.integers(len(_NUCLEI))]
            + _CODAS[rng.integers(len(_CODAS))]
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def generate(n_docs=3000, n_queries=180, n_topics=40, n_aspects=6, seed=7):
    rng = np.random.default_rng(seed)
    n_topic_terms, n_aspect_terms, n_filler = 12, 8, 400
    total_words = n_topics * (n_topic_terms + n_aspects * n_aspect_terms) + n_filler
    words = _wordlist(rng, total_words)
    pos = 0

    def take(k):
        nonlocal pos
        out = words[pos : pos + k]
        pos += k
        return out

    topic_terms = [take(n_topic_terms) for _ in range(n_topics)]
    aspect_terms = [
        [take(n_aspect_terms) for _ in range(n_aspects)] for _ in range(n_topics)
    ]
    filler = take(n_filler)

    docs = []
    for i in range(n_docs):
        t = int(rng.integers(n_topics))
        a = int(rng.integers(n_aspects))
        mix_t = int(rng.integers(n_topics)) if rng.random() < 0.10 else t
        n_tok = int(rng.integers(45, 75))
        toks = []
        for _ in range(n_tok):
            r = rng.random()
            if r < 0.40:
                src = topic_terms[t if rng.random() < 0.7 else mix_t]
            elif r < 0.65:
                src = aspect_terms[t][a]
            else:
                src = filler
            toks.append(src[rng.integers(len(src))])
        docs.append(
            {"_id": f"s{i}", "topic": t, "aspect": a, "mix": mix_t,
             "text": " ".join(toks)}
        )

    queries, qrels = [], {}
    for qi in range(n_queries):
        t = int(rng.integers(n_topics))
        a = int(rng.integers(n_aspects))
        toks = [topic_terms[t][rng.integers(n_topic_terms)] for _ in range(4)]
        toks += [aspect_terms[t][a][rng.integers(n_aspect_terms)] for _ in range(4)]
        qid = f"q{qi}"
        queries.append({"_id": qid, "text": " ".join(toks)})
        rel = {}
        for d in docs:
            if d["topic"] == t:
                rel[d["_id"]] = 2 if d["aspect"] == a else 1
        qrels[qid] = rel
    return docs, queries, qrels


def main(argv=None) -> str:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=3000)
    p.add_argument("--n-queries", type=int, default=180)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--name", default="synth3k")
    args = p.parse_args(argv)

    docs, queries, qrels = generate(
        n_docs=args.n_docs, n_queries=args.n_queries, seed=args.seed
    )
    out_dir = os.path.join(_ROOT, "benchmarks", "data", "beir", args.name)
    os.makedirs(os.path.join(out_dir, "qrels"), exist_ok=True)
    with open(os.path.join(out_dir, "corpus.jsonl"), "w") as f:
        for d in docs:
            f.write(json.dumps({"_id": d["_id"], "title": "", "text": d["text"]}) + "\n")
    with open(os.path.join(out_dir, "queries.jsonl"), "w") as f:
        for q in queries:
            f.write(json.dumps(q) + "\n")
    n_rel = 0
    with open(os.path.join(out_dir, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for qid in sorted(qrels, key=lambda s: int(s[1:])):
            for did, score in qrels[qid].items():
                f.write(f"{qid}\t{did}\t{score}\n")
                n_rel += 1
    print(
        f"wrote {out_dir}: {len(docs)} docs, {len(queries)} queries, "
        f"{n_rel} graded qrels"
    )
    return out_dir


if __name__ == "__main__":
    main()
