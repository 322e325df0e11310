"""Benchmark / tooling scripts run end-to-end with tiny configs, plus the
OpenAPI surface snapshot gate (reference test strategy: SURVEY.md §4.3)."""

import json
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)


def test_benchmark_script(tmp_path, capsys):
    import benchmark

    out = tmp_path / "bench.json"
    rc = benchmark.main(["--n", "40", "--d", "12", "--k", "3", "--trials", "2", "--out", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["aggregates"]["settle_ms"]["mean"] > 0
    assert len(data["trials"]) == 2


def test_benchmark_proof_mode(capsys):
    import benchmark

    rc = benchmark.main(["--proof", "--n", "30", "--d", "10", "--k", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "chain_verdict" in out["proof"]
    assert out["proof"]["gate_build_ms"] > 0


def test_scale_benchmark_script(tmp_path, capsys):
    import scale_benchmark

    out = tmp_path / "scale.jsonl"
    rc = scale_benchmark.main(
        ["--sizes", "30,60", "--d", "10", "--k", "3", "--trials", "1", "--out", str(out)]
    )
    assert rc == 0
    lines = [json.loads(line) for line in out.read_text().splitlines()]
    assert {r["N"] for r in lines} == {30, 60}


def test_proof_hallucination_gating(capsys):
    import proof_hallucination

    rc = proof_hallucination.main(["--trials", "8", "--k", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    # gating must eliminate or strictly reduce trap selection
    assert (
        out["oscillink_gated"]["hallucination_rate"]
        <= out["baseline_cosine"]["hallucination_rate"]
    )
    assert out["oscillink_gated"]["trap_share"] == 0.0


def test_perf_check_gate(tmp_path):
    import perf_check

    base = {"aggregates": {m: {"mean": 10.0} for m in ("build_ms", "settle_ms", "receipt_ms")}}
    good = {"aggregates": {m: {"mean": 11.0} for m in ("build_ms", "settle_ms", "receipt_ms")}}
    bad = {"aggregates": {m: {"mean": 20.0} for m in ("build_ms", "settle_ms", "receipt_ms")}}
    bp, gp, badp = tmp_path / "b.json", tmp_path / "g.json", tmp_path / "bad.json"
    bp.write_text(json.dumps(base))
    gp.write_text(json.dumps(good))
    badp.write_text(json.dumps(bad))
    assert perf_check.main(["--baseline", str(bp), "--current", str(gp)]) == 0
    assert perf_check.main(["--baseline", str(bp), "--current", str(badp)]) == 1
    assert (
        perf_check.main(["--baseline", str(bp), "--current", str(badp), "--non-blocking"]) == 0
    )


def test_beir_synthetic_harness(capsys):
    import bench_beir

    rc = bench_beir.main(
        ["--synthetic", "--n-docs", "300", "--d", "32", "--n-queries", "4", "--candidates", "20"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["cosine_ndcg@10"] > 0.3
    # lattice rerank stays within a reasonable band of the cosine baseline
    assert out["oscillink_ndcg@10"] > 0.3 * out["cosine_ndcg@10"]


def test_real_benchmark_cli(tmp_path, capsys):
    """reference scripts/real_benchmark.py contract: JSONL corpus in,
    cosine-vs-oscillink metrics out (F1/hallucination/trap share/latency)."""
    import real_benchmark

    rows = [
        {"id": f"d{i}", "text": f"topic alpha document number {i} about cats",
         "label": 1, "trap": 0}
        for i in range(6)
    ] + [
        {"id": "t0", "text": "cats are actually robots from mars",
         "label": 0, "trap": 1},
        {"id": "d9", "text": "unrelated passage about tax law", "label": 0,
         "trap": 0},
    ]
    path = tmp_path / "corpus.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in rows))
    save = tmp_path / "topk.json"
    rc = real_benchmark.main([
        "--input", str(path), "--id-col", "id", "--label-col", "label",
        "--trap-col", "trap", "--query", "documents about cats", "--k", "3",
        "--embed", "lsa", "--json", "--save-topk", str(save),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    for mode in ("cosine", "oscillink"):
        assert {"time_ms", "topk_ids", "f1", "hallucination",
                "trap_share"} <= set(out[mode])
        assert len(out[mode]["topk_ids"]) == 3
    assert json.load(open(save))["cosine"] == out["cosine"]["topk_ids"]


def test_benchmark_gating_compare_cli(capsys):
    import benchmark_gating_compare

    rc = benchmark_gating_compare.main(
        ["--N", "120", "--D", "32", "--trials", "1", "--json"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    for mode in ("uniform", "diffusion"):
        s = out["summary"][mode]
        assert s["mean_settle_ms"] >= 0 and s["mean_deltaH"] > 0
    assert out["summary"]["diffusion"]["mean_gate_ms"] > 0
    assert len(out["trials"]["uniform"]) == 1


def test_beir_real_mode(tmp_path, capsys):
    """The ACTUAL run_beir code path (VERDICT r3 item 5): BEIR-format folder
    built by make_beir_dataset, native loader, LSA embeddings, nDCG parity
    with the cosine baseline on the vendored real-text corpus."""
    import bench_beir
    import make_beir_dataset

    folder = make_beir_dataset.main()
    corpus, queries, qrels = bench_beir.load_beir_folder(folder)
    assert len(corpus) == 156 and len(queries) == 52
    assert all(qid in qrels for qid in queries)
    assert sum(len(v) for v in qrels.values()) == 260

    rc = bench_beir.main([
        "--dataset", "minicorpus",
        "--data-dir", os.path.join(os.path.dirname(folder)),
        "--embed", "lsa", "--n-queries", "8", "--candidates", "20",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    out = json.loads(text[text.index("{"):])  # converter logs precede the JSON
    assert out["mode"] == "beir" and out["queries"] == 8
    assert out["cosine_ndcg@10"] > 0.5  # real embeddings, real corpus
    assert out["oscillink_ndcg@10"] > 0.8 * out["cosine_ndcg@10"]


def test_openapi_surface_snapshot():
    import export_openapi

    schema = export_openapi.build_schema()
    baseline = json.load(
        open(os.path.join(os.path.dirname(SCRIPTS), "openapi_baseline.json"))
    )
    removed = export_openapi.surface(baseline) - export_openapi.surface(schema)
    assert not removed, f"breaking API change: {removed}"
    # spot-check the core endpoints exist
    s = export_openapi.surface(schema)
    for ep in (
        ("/health", "get"),
        ("/v1/settle", "post"),
        ("/v1/receipt", "post"),
        ("/v1/bundle", "post"),
        ("/v1/chain/receipt", "post"),
        ("/v1/jobs/settle", "post"),
        ("/v1/jobs/{job_id}", "get"),
        ("/stripe/webhook", "post"),
        ("/metrics", "get"),
    ):
        assert ep in s, f"missing endpoint {ep}"


def test_version_sync():
    import re

    import oscillink_tpu

    text = open(
        os.path.join(os.path.dirname(SCRIPTS), "pyproject.toml"), encoding="utf-8"
    ).read()
    m = re.search(r'(?m)^version\s*=\s*"([^"]+)"', text)
    assert m and m.group(1) == oscillink_tpu.__version__


@pytest.mark.parametrize("mod", ["competitor_benchmark", "http_benchmark", "plot_benchmarks"])
def test_scripts_importable(mod):
    __import__(mod)


def test_adaptive_benchmark(capsys):
    import benchmark_adaptive

    rc = benchmark_adaptive.main(["--trials", "4", "--n", "30", "--d", "12"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["tuned"]["tune_f1"] >= out["default"]["tune_f1"]


def test_adaptive_suite(capsys):
    # one corpus, semantic leg only: the random leg re-derives the same
    # compile set, and the corpus path itself is what needs coverage
    import bench_adaptive_suite

    rc = bench_adaptive_suite.main(
        ["--trials", "2", "--datasets", "capitals", "--semantic-only"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["suite"] == "adaptive"
    assert len(out["cases"]) == 1
    case = out["cases"][0]
    assert case["dataset"] == "capitals" and case["semantic"] is True
    assert 0.0 <= case["tuned"]["test_f1"] <= 1.0
    assert out["summary"][0]["tuned_test_f1"] == case["tuned"]["test_f1"]


def test_micro_dynamics(capsys):
    import bench_micro_dynamics

    rc = bench_micro_dynamics.main(["--n", "50", "--d", "12", "--k", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    caps = [r["row_cap"] for r in out["row_cap_sweep"]]
    assert caps == sorted(caps)
    assert out["start_modes"]["warm_iters"] >= 1


def test_stripe_setup_dry_run(tmp_path, capsys):
    import stripe_setup

    rc = stripe_setup.main(["--dry-run", "--out", str(tmp_path / "pm.json")])
    assert rc == 0
    assert (tmp_path / "pm.json").exists()


def test_stripe_payment_link_dry_run(capsys):
    import stripe_payment_link

    rc = stripe_payment_link.main(["--tier", "beta", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "payment_link" in out
    # pro gated behind --allow-pro (early-beta contract)
    assert stripe_payment_link.main(["--tier", "pro", "--dry-run"]) == 2
    assert (
        stripe_payment_link.main(["--tier", "pro", "--allow-pro", "--dry-run"]) == 0
    )


def test_stripe_webhook_manage_dry_run(capsys):
    import stripe_webhook_manage

    assert stripe_webhook_manage.main(["list", "--dry-run"]) == 0
    assert stripe_webhook_manage.main(["create", "--dry-run"]) == 0
    rc = stripe_webhook_manage.main(["rotate", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "signing_secret" in out


def test_check_openapi_diff(tmp_path, capsys):
    """Standalone breaking-change detector: additions fine, removals exit 2,
    missing files exit 1 (reference scripts/check_openapi_diff.py contract)."""
    import check_openapi_diff

    base = {"paths": {"/a": {"post": {"summary": "x"}}, "/b": {"get": {}}}}
    cur_ok = {"paths": {**base["paths"], "/c": {"get": {}}}}  # addition only
    cur_bad = {"paths": {"/a": {"post": {"summary": "x"}}}}  # /b removed
    pb, pok, pbad = tmp_path / "b.json", tmp_path / "ok.json", tmp_path / "bad.json"
    pb.write_text(json.dumps(base))
    pok.write_text(json.dumps(cur_ok))
    pbad.write_text(json.dumps(cur_bad))

    assert check_openapi_diff.main(["--baseline", str(pb), "--current", str(pok)]) == 0
    assert check_openapi_diff.main(["--baseline", str(pb), "--current", str(pbad)]) == 2
    out = capsys.readouterr().out
    assert "REMOVED paths./b" in out
    assert (
        check_openapi_diff.main(
            ["--baseline", str(tmp_path / "nope.json"), "--current", str(pok)]
        )
        == 1
    )


def test_signed_webhook_script_signature():
    """The script's header construction matches the service verifier."""
    import time as _time

    import test_signed_webhook as tsw

    from oscillink_tpu.service.webhooks import verify_stripe_signature

    payload = b'{"id": "evt_x", "type": "t"}'
    hdr = tsw.sign(payload, "whsec_abc", int(_time.time()))
    assert verify_stripe_signature(payload, hdr, "whsec_abc")
    assert not verify_stripe_signature(payload, hdr, "whsec_other")


def test_billing_env_script(tmp_path, capsys, monkeypatch):
    """price_map.json -> the exact env value service/billing.py parses;
    dotenv mode preserves unrelated lines and replaces stale values."""
    import billing_env

    pm = tmp_path / "price_map.json"
    pm.write_text(json.dumps({"price_b": "enterprise", "price_a": "pro"}))
    assert billing_env.main(["--price-map", str(pm)]) == 0
    out = capsys.readouterr().out.strip()
    value = out.split("'")[1]
    monkeypatch.setenv("OSCILLINK_STRIPE_PRICE_MAP", value)
    from oscillink_tpu.service.billing import price_map

    assert price_map() == {"price_a": "pro", "price_b": "enterprise"}

    dotenv = tmp_path / ".env.billing"
    dotenv.write_text("UNRELATED=keepme\nOSCILLINK_STRIPE_PRICE_MAP=stale\n")
    assert billing_env.main(
        ["--price-map", str(pm), "--dotenv", str(dotenv), "--webhook-secret", "whsec_x"]
    ) == 0
    text = dotenv.read_text()
    assert "UNRELATED=keepme" in text
    assert "stale" not in text
    assert "OSCILLINK_STRIPE_WEBHOOK_SECRET=whsec_x" in text

    bad = tmp_path / "bad.json"
    bad.write_text("[1,2]")
    assert billing_env.main(["--price-map", str(bad)]) == 1
