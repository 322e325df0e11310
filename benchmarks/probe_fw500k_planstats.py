"""Plan-statistics calibration for the full-width windowed router gate.

fw500k_lattice.json proved the production full-width windowed settle FITS
one chip at 500k (376/365/~ ms vs the routed gather 573).  To admit that
regime in auto mode the router needs a working-set estimate whose budget
is calibrated to the proven-fit point; this probe rebuilds the SAME
corpus's window plan (no settle) and records the terms the estimate uses:
n_pad, off_last (-> right-sized contrib length), s_max, n_strag, coverage.

Writes benchmarks/fw500k_planstats.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("OSCILLINK_COMPILE_CACHE_DIR", "/tmp/oscillink_jaxcache")
os.environ["OSCILLINK_WINDOWED_MATVEC"] = "1"
os.environ["OSCILLINK_COL_CHUNKS"] = "1"

import numpy as np


def main():
    from oscillink_tpu.core.lattice import OscillinkLattice

    n, d, k = 500_000, 768, 8
    rng = np.random.default_rng(0)  # SAME corpus as probe_fw500k_lattice
    centers = rng.standard_normal((64, d)).astype(np.float32)
    assign = np.sort(rng.integers(0, 64, size=n))
    Y = (centers[assign] + 0.35 * rng.standard_normal((n, d))).astype(np.float32)

    t0 = time.perf_counter()
    lat = OscillinkLattice(Y, kneighbors=k, similarity="fast")
    build_ms = 1000.0 * (time.perf_counter() - t0)
    ctx = lat._window_ctx
    assert ctx is not None
    plan = ctx.plan
    off_last = int(np.asarray(plan.strag_off)[-1])
    s_max = int(ctx.oh.strag.shape[1])
    keep = int(plan.strag_w.shape[0])
    block_gb = n * d * 4 / 1e9
    n_pad = int(plan.n_pad)
    onehot_gb = n_pad * ctx.oh.main.shape[1] * ctx.oh.main.dtype.itemsize / 1e9
    strag_oh_gb = n_pad * s_max * 2 / 1e9
    contrib_gb = keep * d * 4 / 1e9
    out = {
        "config": "same 500k clustered corpus as fw500k_lattice.json; plan "
        "stats only (no settle)",
        "build_ms": round(build_ms, 1),
        "n_pad": n_pad,
        "coverage": (
            round(float(lat._window_coverage), 4)
            if lat._window_coverage is not None
            else None
        ),
        "s_max": s_max,
        "off_last": off_last,
        "contrib_rows_kept": keep,
        "est_terms_gb": {
            "cg_state_8_blocks": round(8 * block_gb, 3),
            "onehot_main": round(onehot_gb, 3),
            "strag_onehot": round(strag_oh_gb, 3),
            "contrib_f32": round(contrib_gb, 3),
        },
        "est_total_gb": round(
            8 * block_gb + onehot_gb + strag_oh_gb + contrib_gb + 0.5, 3
        ),
        "note": "fw500k_lattice.json measured this exact configuration "
        "running at 376 ms settle — est_total_gb is therefore a PROVEN-FIT "
        "point for the router budget (the raw sum overcounts: XLA frees / "
        "reuses several CG blocks in-program; only the relative ordering "
        "across N matters for the gate)",
    }
    with open(os.path.join(REPO, "benchmarks", "fw500k_planstats.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
