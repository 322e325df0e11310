"""Headline benchmark: E2E lattice build + settle + receipt at N=5000, D=128, k=6.

This is the largest config in the reference's own checked-in scale benchmark
(benchmarks/scale_latest.jsonl, BASELINE.md): graph build 2161.6 ms + settle
280.0 ms + U* stationary solve 305.7 ms = 2747.3 ms E2E on its dev CPU.  We
run the identical workload on one TPU chip (warm, compile-cached, median over
repeats), anchors transferred host->device per pass.

Environment note: this TPU is reached through a tunnel whose device->host
data channel has a one-time setup measured anywhere from 26 s to WEDGED for
tens of minutes (the control channel — dispatch + completion sync — stays
healthy throughout).  The benchmark therefore measures E2E-to-computed
(h2d + build + settle + receipt compute, synced via block_until_ready) on
every pass, and attempts full receipt READBACK passes under a deadline in a
worker thread; when the readback channel is healthy the headline value
includes it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
vs_baseline > 1 means faster than the reference CPU.
"""

from __future__ import annotations

import json
import sys
import threading
import time

import numpy as np

BASELINE_N5000_MS = 2747.3  # reference benchmarks/scale_latest.jsonl (dev CPU)
BASELINE_N1200_MS = 40.0  # reference README.md:174-184
REPEATS = 12
READBACK_DEADLINE_S = 420.0


def _data(n, d, seed=0):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = (Y[:32].mean(axis=0) / (np.linalg.norm(Y[:32].mean(axis=0)) + 1e-12)).astype(
        np.float32
    )
    return Y, psi


def compute_pass(OscillinkLattice, Y, psi, k):
    """One E2E pass synced with block_until_ready (control channel only —
    no device->host data readback)."""
    import jax

    from oscillink_tpu.core.lattice import _jit_deltaH

    t0 = time.perf_counter()
    lat = OscillinkLattice(Y, kneighbors=k)
    lat.set_query(psi)
    lat.settle(dt=1.0, max_iters=12, tol=1e-3)
    ustar = lat._solve_ustar_device()
    dH = _jit_deltaH(lat._graph, lat._path, lat._U_dev, ustar, lat._lam(), lat._B_dev)
    jax.block_until_ready(dH)
    return 1000.0 * (time.perf_counter() - t0), dH


def readback_pass(OscillinkLattice, Y, psi, k):
    """One E2E pass including the receipt readback (device->host data)."""
    t0 = time.perf_counter()
    lat = OscillinkLattice(Y, kneighbors=k)
    lat.set_query(psi)
    lat.set_receipt_detail("light")
    lat.settle(dt=1.0, max_iters=12, tol=1e-3)
    rec = lat.receipt()
    assert np.isfinite(rec["deltaH_total"])
    return 1000.0 * (time.perf_counter() - t0), rec["deltaH_total"]


def fused_pass(Y, psi, k):
    """One-shot fused pipeline (models/oneshot.py): one dispatch, one fetch."""
    from oscillink_tpu.models.oneshot import settle_receipt_light

    t0 = time.perf_counter()
    rec = settle_receipt_light(Y, psi, kneighbors=k)
    assert np.isfinite(rec["deltaH_total"])
    return 1000.0 * (time.perf_counter() - t0), rec["deltaH_total"]


def slope_e2e_ms(Y, psi, k):
    """Slope-timed E2E (build + settle + U* + deltaH) that survives BOTH
    tunnel failure modes: lying completion-sync AND a wedged big-readback
    channel.  R in {4, 24} full pipelines are chained inside one jit with a
    scalar data dependence between reps (rep i's anchors are perturbed by
    ~1e-7 * deltaH_{i-1}, so XLA cannot hoist or dedupe); the only fetch is
    one scalar, which cannot complete before the compute feeding it.
    Returns (ms_per_pass, deltaH) — pure device compute per pass (excludes
    h2d and readback, stated in the headline quality tag)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from oscillink_tpu.models.coherence import EnergyParams
    from oscillink_tpu.models.oneshot import fused_settle_receipt

    Yd = jnp.asarray(Y)
    psid = jnp.asarray(psi)
    B = jnp.ones(Y.shape[0], jnp.float32)
    lam = EnergyParams.make(1.0, 0.5, 4.0)
    opts = jnp.asarray([1.0, 1.0, 1e-3, 12, 1e-4, 64], jnp.float32)

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(Y, reps):
        def body(i, carry):
            s, _ = carry
            _, _, pack = fused_settle_receipt(Y + s, psid, B, lam, opts, k)
            s2 = jnp.minimum(jnp.abs(pack[0]), 1.0) * 1e-7
            return (s2, pack[0])

        s, dh = lax.fori_loop(0, reps, body, (jnp.float32(0.0), jnp.float32(0.0)))
        return dh + 0.0 * s

    for reps in (4, 24):
        float(jax.device_get(chain(Yd, reps)))  # compile + warm
    ts = []
    dh = 0.0
    for reps in (4, 24, 4, 24):
        t0 = time.perf_counter()
        dh = float(jax.device_get(chain(Yd, reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    per = ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / 20
    return per, dh


def matvec_kernel_compare():
    """Windowed Pallas kernel vs the XLA gather matvec at 100k x 768 x k8.

    Slope-timed (T24-T4)/20 chained applies so the tunnel's RPC floor and a
    possibly-lying block_until_ready cancel out of the measurement."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from oscillink_tpu.ops.graph import Graph, lap_matvec
    from oscillink_tpu.ops.pallas import window_spmv as ws

    rng = np.random.default_rng(0)
    n, d, k = 100_000, 768, 8
    idx = ((np.arange(n)[:, None] + rng.integers(-400, 400, size=(n, k))) % n).astype(
        np.int32
    )
    wn = (rng.random((n, k)) * 0.1).astype(np.float32)
    # R=W=384 aligned geometry — the production default since the round-4
    # sweep (window_geometry_125k.json)
    plan, cov = ws.build_window_plan(idx, wn, W=384, R=384, n_windows=3)
    oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
    X = jnp.asarray(rng.standard_normal((plan.n_pad, d)).astype(np.float32))
    g = Graph(
        idx=jnp.asarray(idx), w=jnp.asarray(wn), wn=jnp.asarray(wn),
        sqrt_deg=jnp.ones(n),
    )

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain_xla(X, reps):
        def body(i, acc):
            return lap_matvec(g, acc) * 0.999

        return jnp.sum(lax.fori_loop(0, reps, body, X[:n])[:8, :8])

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_win(plan, oh, X, reps):
        def body(i, acc):
            return ws.lap_matvec_windowed(plan, oh, acc) * 0.999

        return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

    def slope(fn):
        import jax

        for reps in (4, 24):
            float(jax.device_get(fn(reps)))
        ts = []
        for reps in (4, 24, 4, 24):
            t0 = time.perf_counter()
            float(jax.device_get(fn(reps)))
            ts.append(1000.0 * (time.perf_counter() - t0))
        return ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / 20

    xla_ms = slope(lambda r: chain_xla(X, r))
    win_ms = slope(lambda r: chain_win(plan, oh, X, r))
    return {
        "xla_gather_ms_per_apply": round(xla_ms, 3),
        "windowed_kernel_ms_per_apply": round(win_ms, 3),
        "speedup": round(xla_ms / win_ms, 2) if win_ms > 0 else None,
        "plan_coverage": round(cov, 4),
        "config": "N=100k D=768 k=8, locality-ordered (+-400 neighbor spread)",
    }


def sync_is_trustworthy() -> bool:
    """The tunnel's completion-sync path has been observed to silently stop
    blocking (warm 55-TFLOP calls 'completing' in 0 ms).  Validate it against
    a computation with a known ~0.3 s device cost before trusting any
    block_until_ready-based timing."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    x = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), dtype=jnp.bfloat16)

    @jax.jit
    def heavy(a):
        def body(i, acc):
            return (acc @ a) * 1e-4

        return lax.fori_loop(0, 50, body, a)

    heavy(x).block_until_ready()  # compile
    x2 = x * 1.001
    x2.block_until_ready()
    t0 = time.perf_counter()
    heavy(x2).block_until_ready()
    elapsed = time.perf_counter() - t0
    return elapsed > 0.05  # 55 TFLOP cannot complete faster than this


def _large_n_recorded():
    """Separately recorded large-N rows, read LIVE from the committed
    artifacts (a cold 500k-1M pass through this tunnel takes minutes and
    can wedge; re-measuring inside the bench is not viable)."""
    rec = {
        "source": "benchmarks/scale_tpu.json (rows_round3 + serve_500k_round4) "
        "+ benchmarks/northstar_125k.json + fused_cg_125k.json + cg4_125k.json "
        "+ sharded_build_slice_1m.json + receipt_slice_125k.json "
        "+ geometry_cg5_125k.json",
        "shard125k_cg5_ms": {"windowed_fused_aligned": 51.9,
                             "windowed_fused_oh16": 47.3,
                             "windowed_fused_r256": 59.9, "windowed": 68.8,
                             "gather": 117.0, "gather_bf16": 108.1},
        "shard125k_cg4_ms": {"windowed": 57.3, "gather_bf16_random": 89.8,
                             "gather_f32_random": 100.4},
        "shard125k_realgraph_settle_cg5_ms": {
            "source": "northstar_e2e_125k.json + e2e_settle_dma16_125k.json "
            "(REAL clustered 1M/8 graph, cov 0.067)",
            "bf16x3": 74.8, "oh16": 72.4, "dma16": 65.3,
        },
        "sharded_build_per_chip_1m_ms": 1456.3,
        "receipt_slice_per_chip_1m8_ms": 90.1,
        "solver_program_min_ms": {
            "source": "probe_lowmem3/probe_chunked_1m/probe_settle8_1m "
            "(min-of-3 warm, raw solve programs)",
            "500k_settle": 486.5, "500k_ustar": 575.6,
            "1M_ustar_fresh_c4": 2564.7, "1M_settle_c8": 2885.5,
        },
        "settle_500k_fullwidth_windowed_ms": {
            "source": "fw500k_lattice.json (production lattice settle, "
            "min-of-3 warm; auto routing since 0.4.3)",
            "auto_f32": 372.1, "oh16": 365.1, "dma16": 332.4,
            "previous_gather_route": 573.0,
        },
    }
    try:
        import json as _json
        import os

        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "benchmarks", "scale_tpu.json")) as f:
            doc = _json.load(f)
        # rows_round4 re-measured (N, corpus) pairs after the aligned window
        # geometry landed; prefer those, fall back to round-3 rows for pairs
        # not re-run
        # rows_round5 re-measured every pair with OSCILLINK_SYNC_TIMINGS +
        # min-of-3 (stall-robust; see note_round5); prefer those, fall back
        # to older rows for pairs not re-run
        rows = {}
        for section in ("rows_round3", "rows_round4", "rows_round5"):
            for r in doc.get(section, []):
                if "error" not in r:
                    rows[(r["N"], r.get("corpus", "iso"))] = r
        for r in rows.values():
            key = f"{r['N'] // 1000}k_{r['D']}_{r.get('corpus', 'iso')}"
            rec.setdefault("settle_warm_ms", {})[key] = r.get("settle_warm_ms")
            rec.setdefault("ustar_ms", {})[key] = r.get("ustar_ms")
            rec.setdefault("receipt_full_ms", {})[key] = r.get("receipt_full_ms")
    except Exception as e:  # artifact missing/malformed: carry the error
        rec["rows_error"] = f"{type(e).__name__}: {e}"
    return rec


def _native_1200(log):
    """Host C++ engine at the reference's small headline config — the
    deploy-default serving path below OSCILLINK_NATIVE_SMALL_N, measured
    without touching the (possibly wedged) TPU tunnel."""
    try:
        from oscillink_tpu.native import NativeEngine, native_available

        if not native_available():
            return None
        Yn, psin = _data(1200, 128)

        def native_pass():
            t0 = time.perf_counter()
            eng = NativeEngine(Yn, kneighbors=6)
            eng.set_query(psin)
            eng.settle(max_iters=12, tol=1e-3)
            Ustar, _, _ = eng.solve_ustar(tol=1e-4, max_iters=64)
            eng.deltaH(eng.U, Ustar)
            return 1000.0 * (time.perf_counter() - t0)

        native_pass()
        med_native = float(np.median([native_pass() for _ in range(REPEATS)]))
        log("# native N=1200 done")
        return {
            "e2e_ms": round(med_native, 3),
            "vs_baseline": round(BASELINE_N1200_MS / med_native, 3),
            "backend": "native-host",
        }
    except Exception as e:  # pragma: no cover
        log(f"# native path unavailable: {e}")
        return None


def _device_reachable(timeout_s: int = 240) -> bool:
    """Enumerate devices in a SUBPROCESS under a timeout.  When the tunnel
    is wedged even jax.devices() blocks forever (observed 2026-08-17, hours);
    probing in-process would leave the driver with no JSON line at all."""
    import subprocess

    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        return p.returncode == 0 and bool(p.stdout.strip())
    except Exception:
        return False


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


# The driver captures only the TAIL of this process's output (observed cap:
# 2000 chars) and parses the JSON line from it.  Rounds 3/4 grew `detail`
# past that cap, the line was truncated mid-string, and the recorded result
# became `parsed: null` even though the run succeeded.  So: the full detail
# goes to a file, and the printed line stays comfortably under the cap.
_EMIT_BUDGET = 1200


def _emit(out) -> None:
    """Write full detail to benchmarks/bench_detail_latest.json; print ONE
    compact JSON line (≤ _EMIT_BUDGET chars) as the process's last output."""
    import os as _os

    detail_path = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        "benchmarks",
        "bench_detail_latest.json",
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(out, f, indent=1)
        detail_ref = "benchmarks/bench_detail_latest.json"
    except Exception:
        detail_ref = None

    d = out.get("detail") or {}
    compact_detail = {
        "measurement_quality": str(d.get("measurement_quality", ""))[:160],
        "includes_readback": d.get("includes_readback"),
        "backend": d.get("backend"),
        "baseline_N5000_ms": d.get("baseline_N5000_ms"),
        "full_detail": detail_ref,
    }
    # a few headline-adjacent numbers, cheapest-to-drop last
    for key in (
        "N5000_compute_ms",
        "N1200_compute_ms",
        "N1200_serving_default",
        "cached_last_good",
    ):
        if d.get(key) is not None:
            compact_detail[key] = d[key]
    compact = dict(out)
    compact["detail"] = compact_detail
    line = json.dumps(compact)
    # drop optional keys until the line fits the driver's tail capture
    for key in ("cached_last_good", "N1200_serving_default", "N1200_compute_ms",
                "N5000_compute_ms", "measurement_quality"):
        if len(line) <= _EMIT_BUDGET:
            break
        compact_detail.pop(key, None)
        line = json.dumps(compact)
    print(line)
    sys.stdout.flush()
    sys.stderr.flush()


def _cached_last_good():
    """Last committed bench_latest.json value (detail-only, never headline)."""
    import os as _os

    try:
        cached_path = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)),
            "benchmarks",
            "bench_latest.json",
        )
        return {
            "value": json.load(open(cached_path))["value"],
            "note": "previous committed run; NOT this run's measurement",
        }
    except Exception:
        return None


def _serving_default_1200(r1200_native, fused_ms=None):
    if r1200_native:
        return {
            "backend": "native-host (deploy default: "
            "OSCILLINK_NATIVE_SMALL_N=2048)",
            "e2e_ms": r1200_native["e2e_ms"],
            "vs_baseline": r1200_native["vs_baseline"],
        }
    if fused_ms is not None:
        return {"backend": "tpu-fused", "e2e_ms": fused_ms}
    return None


def _tunnel_down_exit() -> None:
    """Print the honest-null headline when no device is reachable; the
    native-host N=1200 number (TPU-free) is still measured live."""
    log = _log
    log("# device enumeration timed out: tunnel down, emitting null headline")
    cached_detail = _cached_last_good()
    r1200_native = _native_1200(log)
    out = {
        "metric": "e2e_build_settle_receipt_ms_N5000_D128_k6",
        "value": None,
        "unit": "ms",
        "vs_baseline": None,
        "detail": {
            "measurement_quality": (
                "tunnel down: device enumeration timed out — no TPU "
                "measurement this run"
            ),
            "includes_readback": False,
            "cached_last_good": cached_detail,
            "N1200_native": r1200_native,
            "N1200_serving_default": _serving_default_1200(r1200_native),
            "large_n_recorded": _large_n_recorded(),
            "baseline_N5000_ms": BASELINE_N5000_MS,
            "baseline_N1200_ms": BASELINE_N1200_MS,
            "backend": "unreachable",
            "repeats": REPEATS,
        },
    }
    _emit(out)


def main() -> None:
    from oscillink_tpu import OscillinkLattice

    log = _log

    sync_ok = sync_is_trustworthy()
    log(f"# sync trustworthy: {sync_ok}")

    configs = {}
    for n, d, k in ((5000, 128, 6), (1200, 128, 6)):
        Y, psi = _data(n, d)
        t0 = time.perf_counter()
        compute_pass(OscillinkLattice, Y, psi, k)  # compile
        log(f"# compiled N={n} in {time.perf_counter() - t0:.1f}s")
        times = []
        dH = None
        for _ in range(REPEATS):
            t, dH = compute_pass(OscillinkLattice, Y, psi, k)
            times.append(t)
        configs[n] = {
            "compute_e2e_ms": round(float(np.median(times)), 3),
            "Y": Y,
            "psi": psi,
            "k": k,
            "dH_dev": dH,
        }
        log(f"# N={n} compute passes done: {configs[n]['compute_e2e_ms']} ms")

    # full readback passes under a deadline (the d2h channel may be wedged)
    readback = {}

    stop_readback = threading.Event()

    def _readback_worker():
        try:
            for n, cfg in configs.items():
                times = []
                dh = None
                for _ in range(5):
                    if stop_readback.is_set():
                        return  # deadline passed: stop issuing device work
                    t, dh = readback_pass(
                        OscillinkLattice, cfg["Y"], cfg["psi"], cfg["k"]
                    )
                    times.append(t)
                if stop_readback.is_set():
                    return  # don't mutate `readback` after the snapshot
                readback[n] = {
                    "e2e_ms": round(float(np.median(times)), 3),
                    "deltaH": round(float(dh), 2),
                }
                log(f"# N={n} readback passes done: {readback[n]['e2e_ms']} ms")
        except Exception as e:  # pragma: no cover
            log(f"# readback failed: {e}")

    worker = threading.Thread(target=_readback_worker, daemon=True)
    worker.start()
    worker.join(READBACK_DEADLINE_S)
    # signal the worker to stop BEFORE the slope/fused/matvec measurements:
    # a slow-but-alive d2h channel would otherwise keep issuing heavy
    # device work that contaminates every timing below (it may be stuck
    # inside one C++ transfer call, but it issues nothing further)
    stop_readback.set()
    readback_ok = 5000 in readback
    readback = dict(readback)  # snapshot: quality label and detail agree

    # slope-timed E2E: survives lying sync AND wedged big-readback (the
    # round-2 degraded mode) — correctness proven by the scalar deltaH fetch
    slope = {}
    try:
        for n, cfg in configs.items():
            ms, dh = slope_e2e_ms(cfg["Y"], cfg["psi"], cfg["k"])
            assert np.isfinite(dh)
            slope[n] = {"e2e_ms": round(ms, 3), "deltaH": round(dh, 2)}
            log(f"# N={n} slope E2E: {slope[n]['e2e_ms']} ms")
    except Exception as e:  # pragma: no cover
        log(f"# slope E2E failed: {e}")

    # fused one-shot serving path (one dispatch + one scalar fetch)
    fused = {}
    try:
        for n, cfg in configs.items():
            fused_pass(cfg["Y"], cfg["psi"], cfg["k"])  # compile
            times = [fused_pass(cfg["Y"], cfg["psi"], cfg["k"])[0] for _ in range(REPEATS)]
            fused[n] = round(float(np.median(times)), 3)
            log(f"# N={n} fused one-shot: {fused[n]} ms")
    except Exception as e:  # pragma: no cover
        log(f"# fused path failed: {e}")

    # windowed matvec kernel vs XLA gather (the CG hot op)
    matvec = None
    try:
        matvec = matvec_kernel_compare()
        log(f"# matvec kernel compare: {matvec}")
    except Exception as e:  # pragma: no cover
        log(f"# matvec compare failed: {e}")

    # native host engine at the reference's small headline config
    r1200_native = _native_1200(log)

    import jax

    # value preference: full readback (best) > sync-validated compute E2E >
    # device-slope. If all three device channels are broken this run
    # produced no measurement: headline value/vs_baseline are null and any
    # cached last-good number lives ONLY under detail.cached_last_good
    # (never in the headline).
    cached_detail = None
    if readback_ok:
        value, quality = readback[5000]["e2e_ms"], "full-readback"
    elif sync_ok:
        value, quality = configs[5000]["compute_e2e_ms"], "compute-synced"
    elif 5000 in slope:
        value = slope[5000]["e2e_ms"]
        quality = (
            "device-slope (sync + full-readback degraded; slope-timed chained "
            "pipelines, scalar-fetch-proven; excludes h2d/readback)"
        )
    else:
        value, quality = None, "degraded (sync + d2h broken): no measurement this run"
        cached_detail = _cached_last_good()
    out = {
        "metric": "e2e_build_settle_receipt_ms_N5000_D128_k6",
        "value": value,
        "unit": "ms",
        "vs_baseline": round(BASELINE_N5000_MS / value, 3) if value else None,
        "detail": {
            "measurement_quality": quality,
            "includes_readback": readback_ok,
            "cached_last_good": cached_detail,
            "N5000_compute_ms": configs[5000]["compute_e2e_ms"],
            "N5000_readback": readback.get(5000),
            "N5000_slope": slope.get(5000),
            "N5000_fused_ms": fused.get(5000),
            "N1200_compute_ms": configs[1200]["compute_e2e_ms"],
            "N1200_readback": readback.get(1200),
            "N1200_slope": slope.get(1200),
            "N1200_fused_ms": fused.get(1200),
            "N1200_native": r1200_native,
            "N1200_serving_default": _serving_default_1200(
                r1200_native, fused.get(1200)
            ),
            "N1200_oneshot_vs_readback_note": (
                "at N=1200 both paths are tunnel-bound, not compute-bound "
                "(device compute 0.86 ms, each host sync ~25-50 ms RPC): "
                "interleaved A/B medians 50.7 vs 46.8 ms with overlapping "
                "spreads (benchmarks/oneshot_smalln_1200.json), so fused-vs-"
                "readback ordering in any single run is tunnel drift, not a "
                "code property; round 3's 60.4-vs-41.8 flip measured the "
                "paths minutes apart"
            ),
            "matvec_100k": matvec,
            # NOT this run's measurements: separately recorded large-N rows
            # (a cold 500k-1M pass through this tunnel takes minutes and can
            # wedge; the live sources and dates are in the cited artifact)
            "large_n_recorded": _large_n_recorded(),
            "baseline_N5000_ms": BASELINE_N5000_MS,
            "baseline_N5000_source": "reference benchmarks/scale_latest.jsonl (dev CPU)",
            "baseline_N1200_ms": BASELINE_N1200_MS,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "repeats": REPEATS,
            "tunnel_note": (
                "d2h data channel setup is 26s-to-wedged through the axon tunnel; "
                "each d2h RPC ~25-50ms and h2d ~13ms — a ~39ms network floor on "
                "any full-readback E2E that does not exist off-tunnel"
            ),
        },
    }
    _emit(out)
    # the readback worker may still be wedged inside a C++ transfer call;
    # normal interpreter teardown then aborts (SIGABRT in thread unwind) —
    # exit hard once the result is printed
    import os

    os._exit(0)


if __name__ == "__main__":
    if _device_reachable():
        main()
    else:
        _tunnel_down_exit()
