"""Window geometry at the large-N single-chip regime (500k rows).

The lattice router switches to a 2-window (W=512, R=256) plan above
OSCILLINK_WINDOWED_3W_MAX_N=262144 rows on the rationale that the one-hot's
n_win·W·4 B/row HBM stream starts to matter (core/lattice.py).  The round-4
aligned-geometry sweep (window_geometry_125k.json) changed the cost model —
R=W alignment cuts window re-DMA by a third and nearly eliminates
stragglers — so the large-N branch decision needs re-measuring.  This probe
slope-times the real Mosaic kernel at N=500k x 768 x k=8 (±400
locality-banded, the regime clustered corpora reach after reordering) for:

  * (512, 256, 2) — the current >256k production shape
  * (512, 512, 2) — aligned 2-window
  * (384, 384, 3) — the aligned 3-window now default below 256k

Writes benchmarks/window_geometry_500k.json.
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

N, D, K = 500_000, 768, 8
R1, R2 = 3, 13
GEOMETRIES = [
    (512, 256, 2),  # current >256k production shape
    (512, 512, 2),
    (384, 384, 3),
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
        X = jnp.asarray(rng.standard_normal((plan.n_pad, D)).astype(np.float32))

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
        del X, oh, plan

    out = {
        "config": f"N={N} D={D} k={K}, locality-ordered ±400",
        "device": str(jax.devices()[0].device_kind),
        "geometries": rows,
        "method": "slope (T13-T3)/10, two passes averaged; real Mosaic kernel",
    }
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "window_geometry_500k.json"
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
