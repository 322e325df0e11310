"""Windowed-kernel cost vs straggler volume: where is the gather crossover?

Two committed measurements bracket the windowed kernel's low-coverage
regime at the 125k shard (D=768):

  * real CLUSTERED graph, cov 0.067, s_max 512  -> fused cg5 74.9 ms
    (vs f32-gather 117.6) — windowed WINS (northstar_e2e_125k.json)
  * real ISOTROPIC graph, cov 0.019, s_max 2560 -> fused cg4 165.0 ms
    (vs bf16-gather 89.8) — windowed LOSES (iso_straggler_125k.json)

The kernel's per-apply cost is ~linear in s_max (the per-block [s_max, D]
straggler DMA + [R, s_max]x[s_max, D] MXU correction + [Npad, s_max]
one-hot stream all scale with it).  This probe pins the crossover with a
controlled sweep: synthetic graphs with live_k live edges per row at
RANDOM destinations (zero locality — worst case for windows), so
s_max ~= 384*live_k, measuring the windowed and production-shaped gather
(always K=8 row fetches) applies on the SAME graph.

The result justifies OSCILLINK_WINDOWED_LOWCOV_SMAX (the router's
low-coverage acceptance bound).

Writes benchmarks/smax_sweep_125k.json.
Run detached: nohup python benchmarks/probe_smax_sweep.py > /tmp/smax.log 2>&1 &
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

    rng = np.random.default_rng(11)
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

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_win(p, o, x, reps):
        def body(i, carry):
            acc, x = carry
            y = ws.lap_matvec_windowed(p, o, x, W=W, R=R)
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
        X = jnp.asarray(
            np.pad(X0, ((0, plan.n_pad - N), (0, 0))).astype(np.float32)
        )

        win_ms = slope(lambda r: chain_win(plan, oh, X, r))
        g = {"idx": jnp.asarray(idx), "wn": jnp.asarray(wn)}
        gat_ms = slope(lambda r: chain_gather(g, X[:N], r))
        row = {
            "live_k": live_k,
            "coverage": round(float(cov), 4),
            "s_max": int(s_max),
            "windowed_apply_ms": round(win_ms, 3),
            "bf16_gather_apply_ms": round(gat_ms, 3),
        }
        rows.append(row)
        print(f"# {json.dumps(row)}", flush=True)

    out = {
        "config": f"N={N} D={D} K={K} W={W} R={R} n_windows={NWIN}; "
        "synthetic graphs, live_k live edges/row at RANDOM destinations "
        "(zero locality), gather arm always fetches K=8 rows "
        "(production shape)",
        "method": "slope (T24-T4)/20, two passes averaged; both arms per "
        "graph in one process",
        "rows": rows,
        "anchors": {
            "clustered_real": "cov 0.067 s_max 512 -> fused cg5 74.9 ms "
            "(northstar_e2e_125k.json)",
            "iso_real": "cov 0.019 s_max 2560 -> apply 29.3 ms, fused cg4 "
            "165 ms (iso_straggler_125k.json)",
        },
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "smax_sweep_125k.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
