"""Straggler-volume crossover under the dma16 tier: does the router's
low-coverage acceptance bound move up?

smax_sweep_125k.json pinned the windowed-vs-gather crossover at ~800
straggler rows per block with the default (f32-stored) contribution buffer:
windowed 9.2 / 13.0 ms/apply at s_max 384 / 768 (wins), 19.8 at 1152
(loses to the flat ~14 ms bf16 gather).  dma16_125k.json then measured the
bf16-STORED buffer cutting the straggler-dominated apply by ~22% at the
extreme (s_max 2560: 30.2 -> 23.5 ms).  This probe re-runs the controlled
sweep's crossover points under dma16 on the SAME synthetic graphs
(seed 11, live_k edges/row at random destinations) to justify a
tier-aware OSCILLINK_WINDOWED_LOWCOV_SMAX default.

Writes benchmarks/smax_sweep_dma16_125k.json.
Run detached: nohup python benchmarks/probe_smax_sweep_dma16.py > /tmp/smax16.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OSCILLINK_COMPILE_CACHE_DIR", "/tmp/oscillink_jaxcache")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from oscillink_tpu.utils.compile_cache import configure_compile_cache

configure_compile_cache()

N, D, K = 125_000, 768, 8
W, R, NWIN = 384, 384, 3
R1, R2 = 4, 24


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

    rng = np.random.default_rng(11)  # SAME graphs as probe_smax_sweep
    X0 = rng.standard_normal((N, D)).astype(np.float32)

    def lap_gather_bf16(g, X):
        Xb = X.astype(jnp.bfloat16)
        acc = X
        for a in range(K):
            rows = jnp.take(Xb, g["idx"][:, a], axis=0).astype(jnp.float32)
            acc = acc - g["wn"][:, a][:, None] * rows
        return acc

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_gather(g, x, reps):
        def body(i, carry):
            acc, x = carry
            y = lap_gather_bf16(g, x)
            return (acc + y[0, 0], x * 0.9999 + y * 1e-6)

        return lax.fori_loop(0, reps, body, (jnp.float32(0.0), x))[0]

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def chain_win(p, o, x, reps, precision):
        def body(i, carry):
            acc, x = carry
            y = ws.lap_matvec_windowed(p, o, x, W=W, R=R, precision=precision)
            return (acc + y[0, 0], x * 0.9999 + y * 1e-6)

        return lax.fori_loop(0, reps, body, (jnp.float32(0.0), x))[0]

    rows = []
    for live_k in (1, 2, 3, 4, 6):
        idx = rng.integers(0, N, size=(N, K)).astype(np.int32)
        wn = np.zeros((N, K), dtype=np.float32)
        wn[:, :live_k] = (rng.random((N, live_k)) * 0.1 + 0.01).astype(
            np.float32
        )
        plan, cov = ws.build_window_plan(idx, wn, W=W, R=R, n_windows=NWIN)
        s_max = ws.plan_s_max(plan)
        oh = ws.build_onehot(plan, W, s_max)
        oh16 = oh._replace(main=oh.main.astype(jnp.bfloat16))
        X = jnp.asarray(
            np.pad(X0, ((0, plan.n_pad - N), (0, 0))).astype(np.float32)
        )

        win16_ms = slope(lambda r: chain_win(plan, oh16, X, r, "dma16"))
        g = {"idx": jnp.asarray(idx), "wn": jnp.asarray(wn)}
        gat_ms = slope(lambda r: chain_gather(g, X[:N], r))
        row = {
            "live_k": live_k,
            "coverage": round(float(cov), 4),
            "s_max": int(s_max),
            "windowed_dma16_apply_ms": round(win16_ms, 3),
            "bf16_gather_apply_ms": round(gat_ms, 3),
        }
        rows.append(row)
        print(f"# {json.dumps(row)}", flush=True)

    out = {
        "config": f"N={N} D={D} K={K} W={W} R={R} n_windows={NWIN}; "
        "synthetic graphs seed 11 (same as smax_sweep_125k), live_k live "
        "edges/row at RANDOM destinations, gather arm always fetches K=8 "
        "rows (production shape)",
        "method": "slope (T24-T4)/20, two passes averaged; both arms per "
        "graph in one process",
        "rows": rows,
        "f32_store_anchor": "smax_sweep_125k.json: windowed 9.2/13.0/19.8 "
        "ms at s_max 384/768/1152 vs flat ~14 gather (f32 contrib store)",
    }
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "smax_sweep_dma16_125k.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
