"""Real-text quality evidence: the LSA embedder (learned from corpus text)
and the vendored-corpus eval harness (scripts/bench_quality_real.py)."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lsa_embeddings_capture_topical_structure():
    from oscillink_tpu.adapters.lsa import LSAEmbedder

    docs = [
        "the red planet mars has two moons and a thin atmosphere",
        "mars volcanoes include olympus mons the largest in the solar system",
        "paris is the capital of france on the river seine",
        "the eiffel tower stands in paris france",
        "honey bees pollinate crops and dance to communicate",
        "worker bees store honey in wax combs for the winter",
    ]
    emb = LSAEmbedder(dim=8)
    Y = emb.fit(docs)
    assert Y.shape[0] == 6 and Y.shape[1] <= 8
    np.testing.assert_allclose(np.linalg.norm(Y, axis=1), 1.0, atol=1e-5)
    S = Y @ Y.T
    # same-topic pairs must be closer than cross-topic pairs
    assert S[0, 1] > S[0, 2] and S[0, 1] > S[0, 4]
    assert S[2, 3] > S[2, 0] and S[2, 3] > S[2, 5]
    assert S[4, 5] > S[4, 0]


def test_lsa_query_folding_retrieves_right_topic():
    from oscillink_tpu.adapters.lsa import LSAEmbedder

    docs = [
        "mars is the red planet with moons phobos and deimos",
        "paris france capital city eiffel tower",
        "bees make honey and pollinate flowers",
    ]
    emb = LSAEmbedder(dim=4)
    Y = emb.fit(docs)
    q = emb.embed(["tell me about the planet mars and its moons"])[0]
    assert int(np.argmax(Y @ q)) == 0


def test_lsa_deterministic():
    from oscillink_tpu.adapters.lsa import LSAEmbedder

    docs = ["alpha beta gamma", "beta gamma delta", "epsilon zeta eta"]
    Y1 = LSAEmbedder(dim=4).fit(docs)
    Y2 = LSAEmbedder(dim=4).fit(docs)
    np.testing.assert_array_equal(Y1, Y2)


def test_corpus_is_well_formed():
    docs = [
        json.loads(ln)
        for ln in open(os.path.join(REPO, "benchmarks/data/minicorpus.jsonl"))
    ]
    queries = [
        json.loads(ln)
        for ln in open(os.path.join(REPO, "benchmarks/data/miniqueries.jsonl"))
    ]
    assert len(docs) >= 100
    topics = {d["topic"] for d in docs}
    assert {q["topic"] for q in queries} <= topics
    ids = [d["id"] for d in docs]
    assert len(set(ids)) == len(ids)
    for t in topics:
        rows = [d for d in docs if d["topic"] == t]
        assert sum(1 for d in rows if d["trap"]) >= 1
        assert sum(1 for d in rows if not d["trap"]) >= 4


def test_quality_harness_end_to_end(tmp_path):
    """Run the real-embedding eval (full corpus; CPU) and check the artifact
    carries both studies with sane values; the gated lattice must cut the
    trap share versus cosine (the reference's headline claim)."""
    out = tmp_path / "q.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/bench_quality_real.py"),
         "--out", str(out)],
        capture_output=True, text=True, timeout=540,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.loads(out.read_text())
    g = data["hallucination_gating"]
    assert 0 <= g["lattice"]["trap_share_mean"] < g["baseline"]["trap_share_mean"]
    assert g["lattice"]["hallucination_rate"] < g["baseline"]["hallucination_rate"]
    assert g["lattice"]["f1_mean"] > 0.5
    # the full reference protocol (allow-threshold sub-lattice) suppresses
    # every trap, and the rerank bundle LIFTS F1 over the cosine baseline
    assert g["lattice"]["hallucination_rate"] == 0.0
    assert g["lattice_rerank"]["hallucination_rate"] == 0.0
    assert g["lattice_rerank"]["f1_mean"] > g["baseline"]["f1_mean"]
    cv = data["rerank_cv_tuned"]["held_out"]
    pq = cv["per_query_ndcg10"]
    assert pq["wins"] + pq["losses"] + pq["ties"] == 52
    assert 0 < cv["rerank"]["ndcg10"] <= 1
    rr = data["ungated_rerank"]
    assert 0 < rr["oscillink"]["ndcg10"] <= 1
    # the rerank mode (bundle(diversify=False)) holds relevance parity with
    # cosine — within 2 points of nDCG@10 and at/above its recall@5
    assert rr["oscillink_rerank"]["ndcg10"] >= rr["cosine"]["ndcg10"] - 0.02
    assert rr["oscillink_rerank"]["recall5"] >= rr["cosine"]["recall5"]

