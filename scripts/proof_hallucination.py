"""Facts+traps hallucination study (reference scripts/proof_hallucination.py).

Controlled comparison: cosine top-k retrieval vs the gated coherence lattice
on a corpus mixing gold facts, explicit false claims ("traps"), and fillers.
Gating contract matches the whitepaper study (BASELINE.md): traps gated at
0.01, off-topic damped to 0.5, on-topic 1.0.  Reports hallucination rate
(any trap selected), F1 vs gold ids, and trap share, aggregated over trials.

  python scripts/proof_hallucination.py --trials 20 --k 3 --out summary.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys

import numpy as np

# corpus rows: (text, kind) with kind in {fact, offtopic, trap, filler}
CORPORA = {
    "astronomy": [
        ("jupiter is the largest planet in the solar system", "fact"),
        ("saturn is famous for its ring system", "fact"),
        ("the great wall of china is visible in satellite photos", "offtopic"),
        ("jupiter is a rocky planet smaller than earth", "trap"),
        ("the sun orbits jupiter once every decade", "trap"),
        ("beethoven composed nine symphonies", "offtopic"),
        ("jupiter has dozens of known moons including ganymede", "fact"),
        ("glass flows downhill in old windows over centuries", "trap"),
        ("tea is traditionally served with scones", "filler"),
        ("saturn's moon titan has a dense atmosphere", "fact"),
    ],
    # landmark/capital corpus mirroring the reference's 10-doc "paris" study
    # shape: 5 gold facts, 3 explicit false claims, 2 off-topic
    "capitals": [
        ("madrid is the capital of spain", "fact"),
        ("the prado museum is located in madrid", "fact"),
        ("lisbon is the capital of spain", "trap"),
        ("the sagrada familia stands in barcelona", "fact"),
        ("oslo is the capital of japan", "trap"),
        ("spain borders portugal and france", "fact"),
        ("the pyramids of giza are in egypt", "offtopic"),
        ("madrid uses the ruble as its currency", "trap"),
        ("the retiro park is a landmark of madrid", "fact"),
        ("photosynthesis converts light into chemical energy", "offtopic"),
    ],
    "rivers": [
        ("the nile flows north into the mediterranean sea", "fact"),
        ("the amazon carries more water than any other river", "fact"),
        ("the danube flows through vienna and budapest", "fact"),
        ("the nile flows south into the atlantic ocean", "trap"),
        ("mount everest is the tallest mountain on earth", "offtopic"),
        ("the amazon river is located in central asia", "trap"),
        ("chess originated in india as chaturanga", "offtopic"),
        ("the thames passes through london", "fact"),
        ("rivers flow uphill during leap years", "trap"),
        ("bread is made from flour and water", "filler"),
    ],
}


def _embed(texts, d, semantic, rng):
    if semantic:
        from oscillink_tpu.adapters.text import embed_texts

        return embed_texts(texts, fallback_dim=d).astype(np.float32)
    return rng.standard_normal((len(texts), d)).astype(np.float32)


def _metrics(pred, gt_ids, trap_ids, k):
    tp = len([i for i in pred if i in gt_ids])
    fp = len([i for i in pred if i not in gt_ids])
    fn = len([i for i in gt_ids if i not in pred])
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 0.0 if prec == 0.0 and rec == 0.0 else 2 * prec * rec / (prec + rec)
    return {
        "f1": f1,
        "hallucinated": any(i in trap_ids for i in pred),
        "trap_share": len([i for i in pred if i in trap_ids]) / max(1, k),
    }


def run(args):
    from oscillink_tpu import OscillinkLattice

    corpus = CORPORA[args.dataset]
    texts = [t for t, _ in corpus]
    gt_ids = {i for i, (_, kind) in enumerate(corpus) if kind == "fact"}
    trap_ids = {i for i, (_, kind) in enumerate(corpus) if kind == "trap"}
    n = len(texts)

    # The query is the embedding of the FIRST gold fact (reference
    # proof_hallucination.py: psi = Y[0]); with content-hash embeddings the
    # remaining top-k cosine picks are near-random, so the baseline's
    # hallucination exposure is real.
    q_idx = min(gt_ids)
    base_rows, lat_rows = [], []
    for trial in range(args.trials):
        rng = np.random.default_rng(args.seed + trial)
        Y = _embed(texts, args.d, args.semantic, rng)
        psi = (Y[q_idx] / (np.linalg.norm(Y[q_idx]) + 1e-9)).astype(np.float32)

        # cosine baseline
        Yn = Y / (np.linalg.norm(Y, axis=1, keepdims=True) + 1e-9)
        pred_cos = np.argsort(-(Yn @ psi))[: args.k].tolist()
        base_rows.append(_metrics(pred_cos, gt_ids, trap_ids, args.k))

        # gated lattice (whitepaper gating: trap 0.01, off-topic damp, on 1.0);
        # nodes whose gate falls at or below the allow threshold are excluded
        # from the lattice entirely (reference proof_hallucination.py:198-223)
        gates = np.ones(n, dtype=np.float32)
        for i, (_, kind) in enumerate(corpus):
            if kind == "trap":
                gates[i] = args.trap_gate
            elif kind in ("offtopic", "filler"):
                gates[i] = args.offtopic_gate
        allowed = np.nonzero(gates > args.allow_threshold)[0]
        Y_sub, gates_sub = Y[allowed], gates[allowed]
        k_sub = min(args.kneighbors, max(1, len(allowed) - 1))
        lat = OscillinkLattice(Y_sub, kneighbors=k_sub)
        lat.set_query(psi, gates=gates_sub)
        lat.settle(max_iters=12, tol=1e-3)
        pred_lat = [int(allowed[int(e["id"])]) for e in lat.bundle(k=args.k)]
        lat_rows.append(_metrics(pred_lat, gt_ids, trap_ids, args.k))

    def agg(rows):
        return {
            "hallucination_rate": float(np.mean([r["hallucinated"] for r in rows])),
            "f1_mean": float(np.mean([r["f1"] for r in rows])),
            "f1_std": float(np.std([r["f1"] for r in rows])),
            "trap_share": float(np.mean([r["trap_share"] for r in rows])),
        }

    return {
        "dataset": args.dataset,
        "trials": args.trials,
        "k": args.k,
        "baseline_cosine": agg(base_rows),
        "oscillink_gated": agg(lat_rows),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=sorted(CORPORA), default="astronomy")
    p.add_argument("--trials", type=int, default=20)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--d", type=int, default=96)
    p.add_argument("--kneighbors", type=int, default=6)
    p.add_argument("--trap-gate", type=float, default=0.01)
    p.add_argument("--offtopic-gate", type=float, default=0.6)
    p.add_argument("--allow-threshold", type=float, default=0.1)
    p.add_argument("--semantic", action="store_true", help="hash embeddings instead of random")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    result = run(args)
    text = json.dumps(result, indent=2)
    if args.out:
        open(args.out, "w").write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
