"""LATTICE-wrapped full-width windowed settle at 500k: fits? wins?

windowed_fw_500k.json proved the BARE full-width fused cg5 fits one chip
at 500k and runs 204 ms (f32 one-hot) / 188 ms (oh16) vs the routed
gather path's 480-573 ms (rows_round5).  But the bare solve holds fewer
full-width residents than the production settle (Y, U, in-program rhs,
un-donated output — donation is not honored through the axon backend), so
this probe measures the REAL `OscillinkLattice.settle` with the windowed
tier forced past the chunk gate:

    OSCILLINK_WINDOWED_MATVEC=1   (forced mode skips the col-chunk gate)
    OSCILLINK_COL_CHUNKS=1        (force the full-width solve branch)

on a clustered 500k x 768 corpus (locality present, like rows_round5), and
the same with OSCILLINK_WINDOW_PRECISION=oh16.  Each config runs in its
OWN subprocess: a ResourceExhausted attempt leaks device buffers through
the axon backend, so fits-or-fails must be process-isolated.

If this fits and wins, the router's blanket `_auto_col_chunks() > 1` gate
should become a windowed-specific working-set model; if it OOMs, the
gate's conservatism is validated — either way the result is committed.

Writes benchmarks/fw500k_lattice.json.
Run detached: nohup python benchmarks/probe_fw500k_lattice.py > /tmp/fw500kl.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "benchmarks", "fw500k_lattice.json")
CONFIGS = {
    "windowed_fullwidth_f32oh": {
        "OSCILLINK_WINDOWED_MATVEC": "1",
        "OSCILLINK_COL_CHUNKS": "1",
    },
    "windowed_fullwidth_oh16": {
        "OSCILLINK_WINDOWED_MATVEC": "1",
        "OSCILLINK_COL_CHUNKS": "1",
        "OSCILLINK_WINDOW_PRECISION": "oh16",
    },
    # pure AUTO routing: no forced envs — validates the round-5 full-width
    # admission gate (_windowed_fw_est_gb <= budget) routes this regime
    # through the full-width windowed solve on its own
    "auto_routed": {},
}


def run_config(name):
    import numpy as np

    import jax

    from oscillink_tpu.core.lattice import OscillinkLattice

    n, d, k = 500_000, 768, 8
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((64, d)).astype(np.float32)
    assign = np.sort(rng.integers(0, 64, size=n))
    Y = (centers[assign] + 0.35 * rng.standard_normal((n, d))).astype(np.float32)
    psi = (Y[:64].mean(0) / (np.linalg.norm(Y[:64].mean(0)) + 1e-12)).astype(
        np.float32
    )

    t0 = time.perf_counter()
    lat = OscillinkLattice(Y, kneighbors=k, similarity="fast")
    build_ms = 1000.0 * (time.perf_counter() - t0)
    lat.set_query(psi)
    ctx = lat._window_ctx
    res = {
        "build_ms": round(build_ms, 1),
        "window_ctx": ctx is not None,
        "window_fullwidth": bool(getattr(lat, "_window_fullwidth", False)),
        "coverage": (
            round(float(lat._window_coverage), 4)
            if lat._window_coverage is not None
            else None
        ),
    }
    if ctx is None:
        res["error"] = "window ctx not built"
        return res

    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        info = lat.settle(dt=1.0, max_iters=12, tol=1e-3)
        jax.block_until_ready(lat._U_dev)
        walls.append(round(1000.0 * (time.perf_counter() - t0), 1))
    res["settle_ms_all"] = walls
    res["settle_ms"] = min(walls)
    res["settle_iters"] = int(info["iters"])
    res["settle_res"] = float(info["res"])
    print(json.dumps(res), flush=True)  # partial: settle walls are in hand
    # deltaH through the light receipt for a cross-path correctness anchor
    t0 = time.perf_counter()
    lat.set_receipt_detail("light")
    rec = lat.receipt()
    res["receipt_light_ms"] = round(1000.0 * (time.perf_counter() - t0), 1)
    res["deltaH"] = float(rec["deltaH_total"])
    return res


def driver():
    out = {
        "config": "N=500k D=768 k=8 clustered (64 centers, sorted labels), "
        "production OscillinkLattice.settle, windowed tier FORCED past the "
        "chunk gate; min-of-3 warm walls per config, process-isolated",
        "gather_path_anchor": "rows_round5 clustered: settle 573 ms "
        "(min-of-3; scale_tpu.json)",
        "bare_solve_anchor": "windowed_fw_500k.json: fused cg5 204.3 (f32) "
        "/ 187.8 (oh16) ms",
        "results": {},
    }
    for name, env in CONFIGS.items():
        child_env = dict(os.environ)
        child_env.update(env)
        child_env.setdefault("OSCILLINK_COMPILE_CACHE_DIR", "/tmp/oscillink_jaxcache")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            capture_output=True,
            text=True,
            timeout=1500,
            env=child_env,
            cwd=REPO,
        )
        tail = (p.stdout or "").strip().splitlines()
        parsed = None
        for line in reversed(tail):
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    pass
                break
        if parsed is None:
            parsed = {
                "error": f"child rc={p.returncode}",
                "stderr_tail": (p.stderr or "")[-500:],
            }
        out["results"][name] = parsed
        print(f"# {name}: {json.dumps(parsed)[:300]}", flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        print(json.dumps(run_config(sys.argv[2])), flush=True)
    else:
        driver()
