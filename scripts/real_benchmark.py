#!/usr/bin/env python3
"""Real-dataset benchmark CLI (reference scripts/real_benchmark.py contract).

Load a CSV or JSONL of texts (optional labels / trap flags), embed them
(hash contract or corpus-fit LSA), and compare baseline cosine top-k
against the Oscillink lattice bundle (default or tuned params).  Outputs
JSON metrics — F1, hallucination rate, trap share, latency — and optional
top-k listings.

  python scripts/real_benchmark.py --input benchmarks/data/minicorpus.jsonl \
      --text-col text --id-col id --trap-col trap --query "facts about Mars" \
      --k 5 --embed lsa --json

Quality numbers are platform-independent and the solves tiny; runs on CPU
by default (OSCILLINK_QUALITY_PLATFORM overrides).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oscillink_tpu.utils.platform import pin_platform  # noqa: E402

pin_platform(os.environ.get("OSCILLINK_QUALITY_PLATFORM", "cpu"))

import argparse
import csv
import json
import time

import numpy as np


def load_rows(path: str, fmt: str | None):
    if fmt is None:
        ext = os.path.splitext(path)[1].lower()
        fmt = "csv" if ext == ".csv" else "jsonl"
    if fmt == "csv":
        with open(path, encoding="utf-8", newline="") as f:
            return list(csv.DictReader(f))
    with open(path, encoding="utf-8") as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _truthy(v) -> bool:
    if isinstance(v, bool):
        return v
    try:
        return int(v) == 1
    except (TypeError, ValueError):
        return str(v).strip().lower() in ("true", "yes")


def eval_topk(pred, gt_ids, traps, k):
    """F1 against labeled-relevant ids; hallucination = any trap retrieved;
    trap share = fraction of the top-k that is a trap."""
    f1 = None
    if gt_ids is not None:
        tp = sum(1 for i in pred if i in gt_ids)
        prec = tp / max(1, len(pred))
        rec = tp / max(1, len(gt_ids))
        f1 = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
    hall = tshare = None
    if traps is not None:
        hits = sum(1 for i in pred if i in traps)
        hall, tshare = hits > 0, hits / max(1, k)
    return f1, hall, tshare


def cosine_topk(psi, Y, k, exclude=None):
    Yn = Y / (np.linalg.norm(Y, axis=1, keepdims=True) + 1e-9)
    s = Yn @ (psi / (np.linalg.norm(psi) + 1e-9))
    if exclude is not None:
        s[exclude] = -1e9
    return np.argsort(-s)[:k].tolist()


def lattice_topk(Y, psi, k, args, exclude=None):
    from oscillink_tpu import OscillinkLattice

    lat = OscillinkLattice(
        Y, kneighbors=min(args.kneighbors, len(Y) - 1),
        lamG=args.lamG, lamC=args.lamC, lamQ=args.lamQ,
    )
    lat.set_query(psi)
    lat.settle(max_iters=args.max_iters, tol=args.tol)
    out = []
    for e in lat.bundle(k=k + (1 if exclude is not None else 0),
                        diversify=not args.no_diversify):
        if exclude is not None and int(e["id"]) == exclude:
            continue
        out.append(int(e["id"]))
    return out[:k]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--format", choices=["jsonl", "csv"], default=None)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default=None)
    p.add_argument("--label-col", default=None)
    p.add_argument("--trap-col", default=None)
    p.add_argument("--query", default=None)
    p.add_argument("--query-index", type=int, default=None)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--embed", choices=["hash", "lsa"], default="hash")
    p.add_argument("--kneighbors", type=int, default=6)
    p.add_argument("--lamG", type=float, default=1.0)
    p.add_argument("--lamC", type=float, default=0.5)
    p.add_argument("--lamQ", type=float, default=4.0)
    p.add_argument("--max-iters", type=int, default=12)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--autocorrect", action="store_true",
                   help="smart_correct the query text first")
    p.add_argument("--no-diversify", action="store_true")
    p.add_argument("--save-topk", default=None)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    rows = load_rows(args.input, args.format)
    # filter ONCE and derive texts/ids/labels from the same kept rows —
    # slicing the unfiltered list would shift every id/label after a
    # skipped row onto the wrong embedding index
    kept = [r for r in rows if r.get(args.text_col)]
    texts = [str(r[args.text_col]) for r in kept]
    ids = [r.get(args.id_col, i) if args.id_col else i
           for i, r in enumerate(kept)]
    gt_ids = None
    if args.label_col:
        gt_ids = {i for i, r in enumerate(kept)
                  if _truthy(r.get(args.label_col, 0))}
    traps = None
    if args.trap_col:
        traps = {i for i, r in enumerate(kept)
                 if _truthy(r.get(args.trap_col, 0))}

    qtext, exclude = args.query, None
    if qtext is None:
        qi = args.query_index if args.query_index is not None else 0
        qtext, exclude = texts[qi], qi
    if args.autocorrect:
        from oscillink_tpu.preprocess.autocorrect import smart_correct

        qtext = smart_correct(qtext)

    if args.embed == "lsa":
        from oscillink_tpu.adapters.lsa import LSAEmbedder

        emb = LSAEmbedder(dim=64)
        Y = emb.fit(texts).astype(np.float32)
        psi = emb.embed([qtext])[0].astype(np.float32)
    else:
        from oscillink_tpu.adapters.text import embed_texts

        Y = embed_texts(texts)
        psi = embed_texts([qtext])[0]

    t0 = time.perf_counter()
    cos = cosine_topk(psi, Y, args.k, exclude)
    cos_ms = 1000.0 * (time.perf_counter() - t0)
    t0 = time.perf_counter()
    lat = lattice_topk(Y, psi, args.k, args, exclude)
    lat_ms = 1000.0 * (time.perf_counter() - t0)

    out = {"n_docs": len(texts), "k": args.k, "embed": args.embed,
           "query": qtext}
    for name, pred, ms in (("cosine", cos, cos_ms), ("oscillink", lat, lat_ms)):
        f1, hall, tshare = eval_topk(pred, gt_ids, traps, args.k)
        out[name] = {
            "time_ms": round(ms, 2),
            "topk_ids": [ids[i] for i in pred],
            **({"f1": round(f1, 4)} if f1 is not None else {}),
            **({"hallucination": hall, "trap_share": round(tshare, 4)}
               if hall is not None else {}),
        }
    if args.save_topk:
        with open(args.save_topk, "w") as f:
            json.dump({m: out[m]["topk_ids"] for m in ("cosine", "oscillink")},
                      f, indent=2)
    print(json.dumps(out, indent=2) if args.json else out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
