"""Convert the vendored minicorpus to BEIR GenericDataLoader format.

The reference's retrieval-quality harness (reference scripts/bench_beir.py:
55-151) consumes BEIR datasets: a folder with corpus.jsonl (`_id`, `title`,
`text`), queries.jsonl (`_id`, `text`) and qrels/test.tsv
(`query-id\tcorpus-id\tscore`).  This image has no egress, so we exercise
the real `run_beir` code path on the vendored hand-written corpus
(benchmarks/data/minicorpus.jsonl: 26 topics x 5 true passages + 1
plausible-but-false trap; 2 queries/topic) converted to exactly that
layout.  Relevance: same topic AND not a trap -> score 1 (traps are the
corpus's labeled hallucinations and are deliberately non-relevant).

  python scripts/make_beir_dataset.py   # writes benchmarks/data/beir/minicorpus/
"""

from __future__ import annotations

import json
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DATA = os.path.join(_ROOT, "benchmarks", "data")


def main() -> str:
    docs = [json.loads(ln) for ln in open(os.path.join(_DATA, "minicorpus.jsonl"))]
    queries = [json.loads(ln) for ln in open(os.path.join(_DATA, "miniqueries.jsonl"))]

    out_dir = os.path.join(_DATA, "beir", "minicorpus")
    os.makedirs(os.path.join(out_dir, "qrels"), exist_ok=True)

    with open(os.path.join(out_dir, "corpus.jsonl"), "w") as f:
        for d in docs:
            f.write(json.dumps(
                {"_id": d["id"], "title": "", "text": d["text"]}
            ) + "\n")

    with open(os.path.join(out_dir, "queries.jsonl"), "w") as f:
        for q in queries:
            f.write(json.dumps({"_id": q["qid"], "text": q["text"]}) + "\n")

    n_rel = 0
    with open(os.path.join(out_dir, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for q in queries:
            for d in docs:
                if d["topic"] == q["topic"] and not d.get("trap", False):
                    f.write(f"{q['qid']}\t{d['id']}\t1\n")
                    n_rel += 1

    print(f"wrote {out_dir}: {len(docs)} docs, {len(queries)} queries, "
          f"{n_rel} qrels")
    return out_dir


if __name__ == "__main__":
    main()
