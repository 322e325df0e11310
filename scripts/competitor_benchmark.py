"""Competitor benchmark: cosine vs oscillink (default + tuned) vs optional
FAISS/Annoy when installed (reference scripts/competitor_benchmark.py).

Reads JSONL rows {"texts": [...], "query": ..., "labels": [...], "traps": [...]}
or runs the built-in facts+traps corpora; reports per-method ms / F1 /
hallucination / trap share.

  python scripts/competitor_benchmark.py --trials 5 --k 5 --out competitor.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time

import numpy as np


def _f1_hall(pred, labels, traps, k):
    gt = {i for i, lab in enumerate(labels) if int(lab) == 1}
    tp = len([i for i in pred if i in gt])
    fp = len([i for i in pred if i not in gt])
    fn = len([i for i in gt if i not in pred])
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 0.0 if prec == 0.0 and rec == 0.0 else 2 * prec * rec / (prec + rec)
    return f1, any(i in traps for i in pred), len([i for i in pred if i in traps]) / max(1, k)


def _cosine(psi, Y, k):
    Yn = Y / (np.linalg.norm(Y, axis=1, keepdims=True) + 1e-9)
    pn = psi / (np.linalg.norm(psi) + 1e-9)
    t0 = time.perf_counter()
    pred = np.argsort(-(Yn @ pn))[:k].tolist()
    return pred, 1000 * (time.perf_counter() - t0)


def _oscillink(Y, psi, k, params):
    from oscillink_tpu import OscillinkLattice

    t0 = time.perf_counter()
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
    pred = [
        int(e["id"])
        for e in lat.bundle(k=k, diversify=params.get("diversify", True))
    ]
    return pred, 1000 * (time.perf_counter() - t0)


def _ann_backends(psi, Y, k):
    out = {}
    try:  # pragma: no cover — optional
        import faiss  # type: ignore

        Yn = (Y / (np.linalg.norm(Y, axis=1, keepdims=True) + 1e-9)).astype(np.float32)
        index = faiss.IndexFlatIP(Y.shape[1])
        index.add(Yn)
        pn = psi / (np.linalg.norm(psi) + 1e-9)
        t0 = time.perf_counter()
        _, idxs = index.search(pn.reshape(1, -1).astype(np.float32), k)
        out["faiss"] = {"pred": idxs[0].tolist(), "ms": 1000 * (time.perf_counter() - t0)}
    except Exception:
        pass
    try:  # pragma: no cover — optional
        from annoy import AnnoyIndex  # type: ignore

        t = AnnoyIndex(int(Y.shape[1]), metric="angular")
        for i, v in enumerate(Y.tolist()):
            t.add_item(i, v)
        t.build(10)
        t0 = time.perf_counter()
        pred = t.get_nns_by_vector(psi.tolist(), k)
        out["annoy"] = {"pred": pred, "ms": 1000 * (time.perf_counter() - t0)}
    except Exception:
        pass
    try:  # scikit-learn: the ANN arm that IS installable offline (this
        # image has no egress and no faiss/annoy wheels — the artifact
        # records that; sklearn's brute cosine kNN is the same exact-search
        # contract as faiss.IndexFlatIP)
        from sklearn.neighbors import NearestNeighbors  # type: ignore

        nn = NearestNeighbors(n_neighbors=k, metric="cosine", algorithm="brute")
        nn.fit(Y)
        t0 = time.perf_counter()
        _, idxs = nn.kneighbors(psi.reshape(1, -1))
        out["sklearn_nn"] = {
            "pred": idxs[0].tolist(),
            "ms": 1000 * (time.perf_counter() - t0),
        }
    except Exception:
        pass
    return out


def run(args):
    from proof_hallucination import CORPORA

    from oscillink_tpu.adapters.text import embed_texts

    corpus = CORPORA[args.dataset]
    texts = [t for t, _ in corpus]
    labels = [1 if kind == "fact" else 0 for _, kind in corpus]
    traps = [i for i, (_, kind) in enumerate(corpus) if kind == "trap"]
    Y = embed_texts(texts, fallback_dim=args.d).astype(np.float32)
    gt = [i for i, lab in enumerate(labels) if lab]
    methods: dict = {}

    for trial in range(args.trials):
        rng = np.random.default_rng(args.seed + trial)
        q = Y[gt].mean(axis=0) + 0.05 * rng.standard_normal(Y.shape[1]).astype(np.float32)
        psi = (q / (np.linalg.norm(q) + 1e-9)).astype(np.float32)

        rows = {}
        pred, ms = _cosine(psi, Y, args.k)
        rows["cosine"] = (pred, ms)
        pred, ms = _oscillink(Y, psi, args.k, {})
        rows["oscillink"] = (pred, ms)
        pred, ms = _oscillink(
            Y, psi, args.k, {"lamQ": 1.0, "diversify": False}
        )
        rows["oscillink_rerank"] = (pred, ms)
        if args.tune:
            best = None
            for cs in (0.6, 1.0, 1.4):
                for qs in (0.5, 1.0, 1.5):
                    pred_t, ms_t = _oscillink(
                        Y, psi, args.k, {"lamC": 0.5 * cs, "lamQ": 4.0 * qs}
                    )
                    f1_t, _, _ = _f1_hall(pred_t, labels, traps, args.k)
                    if best is None or f1_t > best[2]:
                        best = (pred_t, ms_t, f1_t)
            rows["oscillink_tuned"] = (best[0], best[1])
        for name, r in _ann_backends(psi, Y, args.k).items():
            rows[name] = (r["pred"], r["ms"])

        for name, (pred, ms) in rows.items():
            f1, hall, tshare = _f1_hall(pred, labels, traps, args.k)
            m = methods.setdefault(name, {"ms": [], "f1": [], "hall": [], "trap": []})
            m["ms"].append(ms)
            m["f1"].append(f1)
            m["hall"].append(hall)
            m["trap"].append(tshare)

    return {
        "dataset": args.dataset,
        "n": len(texts),
        "k": args.k,
        "trials": args.trials,
        "methods": {
            name: {
                "ms_mean": float(np.mean(m["ms"])),
                "f1_mean": float(np.mean(m["f1"])),
                "hallucination_rate": float(np.mean(m["hall"])),
                "trap_share": float(np.mean(m["trap"])),
            }
            for name, m in methods.items()
        },
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="astronomy")
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--d", type=int, default=384)
    p.add_argument("--tune", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument(
        "--cpu",
        action="store_true",
        help="force the JAX CPU backend (the axon TPU plugin ignores "
        "JAX_PLATFORMS; must be set before first compute)",
    )
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    result = run(args)
    text = json.dumps(result, indent=2)
    if args.out:
        open(args.out, "w").write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, "scripts")
    sys.exit(main())
