"""Window-plan geometry sweep: attack the windowed kernel's re-DMA term.

`window_precision_125k.json` proved the kernel DMA-bound (dropping MXU
passes buys ~0.15 ms of its 6.64 ms/apply).  The dominant stream is the
per-grid-step window re-fetch: every R-row output block DMAs its n_win
elected W-row windows of X, so window traffic per row scales with
n_win·W·D/R.  The production geometry (W=384, R=256, 3 windows — chosen
over (512, 256, 2) by measurement at 100k, core/lattice.py:714-730) was
tuned over W and n_win but never over R.  Raising R amortizes the same
windows over more output rows (ratio W/R: 1.5 -> 0.75 at R=512) at the
price of coverage (a wider row block must share its 3 windows across a
wider neighbor spread).

This probe measures, at the exact 1M/8 shard (125k x 768 x k=8, same
±400 locality-jitter generator as probe_northstar.py), for each geometry:
plan coverage, straggler count, and slope-timed ms/apply of the REAL
Mosaic kernel (`lap_matvec_windowed`).  Writes
benchmarks/window_geometry_125k.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N, D, K = 125_000, 768, 8
R1, R2 = 4, 24
GEOMETRIES = [  # (W, R, n_windows)
    (384, 256, 3),  # production baseline
    (384, 384, 3),
    (384, 512, 3),
    (512, 512, 3),
    (512, 512, 2),
]


def slope(fn):
    for reps in (R1, R2):
        float(jax.device_get(fn(reps)))
    ts = []
    for reps in (R1, R2, R1, R2):
        t0 = time.perf_counter()
        float(jax.device_get(fn(reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    return ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / (R2 - R1)


def main():
    from oscillink_tpu.ops.pallas import window_spmv as ws

    rng = np.random.default_rng(0)
    idx = ((np.arange(N)[:, None] + rng.integers(-400, 400, size=(N, K))) % N).astype(
        np.int32
    )
    wn = (rng.random((N, K)) * 0.1).astype(np.float32)

    rows = []
    for W, R, n_win in GEOMETRIES:
        t0 = time.perf_counter()
        plan, cov = ws.build_window_plan(idx, wn, W=W, R=R, n_windows=n_win)
        s_max = ws.plan_s_max(plan)
        oh = ws.build_onehot(plan, W, s_max)
        plan_s = time.perf_counter() - t0
        X = jnp.asarray(
            rng.standard_normal((plan.n_pad, D)).astype(np.float32)
        )

        @functools.partial(jax.jit, static_argnums=(3,))
        def chain(plan, oh, X, reps, W=W, R=R):
            def body(i, acc):
                return ws.lap_matvec_windowed(plan, oh, acc, W=W, R=R) * 0.999

            return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

        ms = slope(lambda r: chain(plan, oh, X, r))
        n_strag = int((np.asarray(plan.strag_w) != 0.0).sum())
        row = {
            "W": W,
            "R": R,
            "n_windows": n_win,
            "s_max": s_max,
            "coverage": round(float(cov), 4),
            "stragglers": n_strag,
            "matvec_ms_per_apply": round(ms, 3),
            "window_bytes_per_row": n_win * W * D * 4 // R,
            "onehot_bytes_per_row": n_win * W * 4,
            "plan_build_s_host": round(plan_s, 2),
        }
        rows.append(row)
        print(f"# {row}", flush=True)

    out = {
        "config": f"N={N} (1M/8 shard) D={D} k={K}, locality-ordered ±400",
        "device": str(jax.devices()[0].device_kind),
        "geometries": rows,
        "method": "slope (T24-T4)/20, two passes averaged; real Mosaic kernel",
    }
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "window_geometry_125k.json"
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
