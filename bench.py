"""Headline benchmark: E2E lattice build + settle + receipt at N=5000, D=128, k=6.

This is the largest config in the reference's own checked-in scale benchmark
(benchmarks/scale_latest.jsonl, BASELINE.md): graph build 2161.6 ms + settle
280.0 ms + U* stationary solve 305.7 ms = 2747.3 ms E2E on its dev CPU.  We
run the identical workload on one TPU chip (warm, compile-cached, median over
repeats) — including host->device transfer of the anchors and the
device->host receipt readback.

Note on environment: this TPU is reached through a tunnel whose per-RPC
transfer latency is ~25-50 ms (measured); the E2E floor of ANY implementation
here is ~60 ms.  Compute-only timings are reported in `detail` so the kernel
speed is visible separately.  The smaller N=1200 reference headline (<40 ms
E2E, README.md:174-184) is reported in detail as well.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
vs_baseline > 1 means faster than the reference CPU.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# reference benchmarks/scale_latest.jsonl @ N=5000/D=128/k=6 (dev CPU):
# graph_build 2161.6 + settle 280.0 + ustar_solve 305.7
BASELINE_N5000_MS = 2747.3
BASELINE_N1200_MS = 40.0  # reference README.md:174-184
REPEATS = 15


def run_config(OscillinkLattice, n, d, k, repeats):
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = (Y[:32].mean(axis=0) / (np.linalg.norm(Y[:32].mean(axis=0)) + 1e-12)).astype(
        np.float32
    )

    def one_pass():
        t0 = time.perf_counter()
        lat = OscillinkLattice(Y, kneighbors=k)
        t1 = time.perf_counter()
        lat.set_query(psi)
        lat.set_receipt_detail("light")
        lat.settle(dt=1.0, max_iters=12, tol=1e-3)
        t2 = time.perf_counter()
        rec = lat.receipt()
        t3 = time.perf_counter()
        assert np.isfinite(rec["deltaH_total"])
        return (t1 - t0) * 1e3, (t2 - t1) * 1e3, (t3 - t2) * 1e3, rec["deltaH_total"]

    one_pass()  # compile
    one_pass()
    builds, settles, receipts, totals = [], [], [], []
    dH = 0.0
    for _ in range(repeats):
        b, s, r, dH = one_pass()
        builds.append(b)
        settles.append(s)
        receipts.append(r)
        totals.append(b + s + r)
    med = lambda x: round(float(np.median(x)), 3)  # noqa: E731
    return {
        "e2e_ms": med(totals),
        "build_ms": med(builds),
        "settle_ms": med(settles),
        "receipt_light_ms": med(receipts),
        "deltaH": round(float(dH), 2),
    }


def compile_warmup(OscillinkLattice, n, d, k):
    """Compile every jitted path for a shape WITHOUT any device->host fetch
    (construction, settle, U* solve and deltaH all stay device-side)."""
    import jax

    from oscillink_tpu.core.lattice import _jit_deltaH

    rng = np.random.default_rng(0)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    psi = rng.standard_normal(d).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=k)
    lat.set_query(psi)
    lat.settle(max_iters=2, tol=1e-2)
    ustar = lat._solve_ustar_device()
    dH = _jit_deltaH(lat._graph, lat._path, lat._U_dev, ustar, lat._lam(), lat._B_dev)
    jax.block_until_ready(dH)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from oscillink_tpu import OscillinkLattice

    # Compile every shape first (NO device->host fetch involved), then open
    # the d2h channel once.  Concurrent fetch + compile through the tunnel
    # deadlocks the client, so these stay strictly sequential.
    for shape in ((5000, 128, 6), (1200, 128, 6)):
        t0 = time.perf_counter()
        compile_warmup(OscillinkLattice, *shape)
        print(
            f"# compiled {shape} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
            flush=True,
        )

    # One-time d2h channel setup: measured 26 s - 10 min through axon.
    t0 = time.perf_counter()
    np.asarray(jnp.ones((4, 4)) * 2.0)
    print(
        f"# d2h channel ready in {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
        flush=True,
    )

    r5000 = run_config(OscillinkLattice, 5000, 128, 6, REPEATS)
    print("# N=5000 done", file=sys.stderr, flush=True)
    r1200 = run_config(OscillinkLattice, 1200, 128, 6, REPEATS)
    print("# N=1200 done", file=sys.stderr, flush=True)

    # the framework's latency-optimal backend for the reference's small
    # headline config is the native host engine (service auto-routing via
    # OSCILLINK_NATIVE_SMALL_N)
    r1200_native = None
    try:
        from oscillink_tpu.native import NativeEngine, native_available

        if native_available():
            rng = np.random.default_rng(0)
            Yn = rng.standard_normal((1200, 128)).astype(np.float32)
            psin = rng.standard_normal(128).astype(np.float32)

            def native_pass():
                t0 = time.perf_counter()
                eng = NativeEngine(Yn, kneighbors=6)
                eng.set_query(psin)
                eng.settle(max_iters=12, tol=1e-3)
                Ustar, _, _ = eng.solve_ustar(tol=1e-4, max_iters=64)
                eng.deltaH(eng.U, Ustar)
                return 1000.0 * (time.perf_counter() - t0)

            native_pass()
            times = [native_pass() for _ in range(REPEATS)]
            med_native = float(np.median(times))
            r1200_native = {
                "e2e_ms": round(med_native, 3),
                "vs_baseline": round(BASELINE_N1200_MS / med_native, 3),
                "backend": "native-host",
            }
            print("# N=1200 native done", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"# native path unavailable: {e}", file=sys.stderr, flush=True)

    med = r5000["e2e_ms"]
    out = {
        "metric": "e2e_build_settle_receipt_ms_N5000_D128_k6",
        "value": med,
        "unit": "ms",
        "vs_baseline": round(BASELINE_N5000_MS / med, 3),
        "detail": {
            "N5000": r5000,
            "N1200": {**r1200, "vs_baseline": round(BASELINE_N1200_MS / r1200["e2e_ms"], 3)},
            "N1200_native": r1200_native,
            "baseline_N5000_ms": BASELINE_N5000_MS,
            "baseline_N5000_source": "reference benchmarks/scale_latest.jsonl (dev CPU)",
            "baseline_N1200_ms": BASELINE_N1200_MS,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "repeats": REPEATS,
            "tunnel_note": "d2h/h2d RPC latency ~25-50ms each through axon tunnel; E2E floor ~60ms",
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
