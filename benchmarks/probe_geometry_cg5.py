"""Confirm the aligned window geometry on the full production solve shape.

`window_geometry_125k.json` measured the bare matvec at R=W=384 (5.21 vs
6.60 ms/apply).  This probe measures what the settle actually runs — the
FUSED operator (`k_matvec_windowed`: diag fold + in-kernel ⟨p,Kp⟩) and the
complete fused 5-iteration CG body (`cg_solve_kpap` program shape) — at the
new geometry, same 125k x 768 x k=8 shard, same slope protocol, directly
comparable to `fused_cg_125k.json` (59.9 ms at the old R=256 geometry).

Writes benchmarks/geometry_cg5_125k.json.
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

    rng = np.random.default_rng(0)
    idx = ((np.arange(N)[:, None] + rng.integers(-400, 400, size=(N, K))) % N).astype(
        np.int32
    )
    wn = (rng.random((N, K)) * 0.1).astype(np.float32)
    plan, cov = ws.build_window_plan(idx, wn, W=W, R=R, n_windows=NWIN)
    s_max = ws.plan_s_max(plan)
    oh = ws.build_onehot(plan, W, s_max)
    print(f"# plan: coverage={cov:.4f} s_max={s_max}", flush=True)

    X = jnp.asarray(rng.standard_normal((plan.n_pad, D)).astype(np.float32))
    B = jnp.asarray(rng.random(plan.n_pad).astype(np.float32))
    lamG, lamC, lamQ = 1.0, 0.5, 4.0
    s = lamC
    g = jnp.asarray(((lamG + lamC + lamQ * np.asarray(B)) / s).astype(np.float32))[
        :, None
    ]

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_unfused(plan, oh, X, reps):
        def body(i, acc):
            return ws.lap_matvec_windowed(plan, oh, acc, W=W, R=R) * 0.999

        return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

    @functools.partial(jax.jit, static_argnums=(4,))
    def chain_fused(plan, oh, X, g, reps):
        def body(i, acc):
            out, _ = ws.k_matvec_windowed(plan, oh, acc, g, W=W, R=R)
            return out * 0.999

        return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

    def make_chain_cg(n_iters):
        @functools.partial(jax.jit, static_argnums=(4,))
        def chain(plan, oh, b, g, reps):
            def K_mul(x):
                return ws.k_matvec_windowed(plan, oh, x, g, W=W, R=R)

            def cg_body(b, x0):
                x = x0
                Kx, _ = K_mul(x)
                r = b - Kx * s
                p = r
                rz = jnp.sum(r * r, axis=0)

                def body(i, carry):
                    x, r, p, rz = carry
                    Kp, pkp = K_mul(p)
                    alpha = rz / (pkp * s + 1e-18)
                    x = x + p * alpha
                    r = r - Kp * (alpha * s)
                    rz_new = jnp.sum(r * r, axis=0)
                    p = r + p * (rz_new / (rz + 1e-18))
                    return (x, r, p, rz_new)

                x, r, p, rz = lax.fori_loop(0, n_iters, body, (x, r, p, rz))
                return x

            def body(i, x):
                return cg_body(b, x * 0.999)

            return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

        return chain

    chain_cg5 = make_chain_cg(5)
    chain_cg4 = make_chain_cg(4)

    mv_ms = slope(lambda r: chain_unfused(plan, oh, X, r))
    print(f"# unfused matvec: {mv_ms:.3f} ms/apply", flush=True)
    fmv_ms = slope(lambda r: chain_fused(plan, oh, X, g, r))
    print(f"# fused matvec: {fmv_ms:.3f} ms/apply", flush=True)
    cg_ms = slope(lambda r: chain_cg5(plan, oh, X, g, r))
    print(f"# fused cg5: {cg_ms:.3f} ms/solve", flush=True)
    cg4_ms = slope(lambda r: chain_cg4(plan, oh, X, g, r))
    print(f"# fused cg4: {cg4_ms:.3f} ms/solve", flush=True)

    out = {
        "config": f"N={N} (1M/8 shard) D={D} k={K}, W={W} R={R} n_windows={NWIN}",
        "device": str(jax.devices()[0].device_kind),
        "plan_coverage": round(float(cov), 4),
        "s_max": s_max,
        "unfused_matvec_ms_per_apply": round(mv_ms, 3),
        "fused_matvec_ms_per_apply": round(fmv_ms, 3),
        "fused_cg5_ms": round(cg_ms, 3),
        "fused_cg4_ms": round(cg4_ms, 3),
        "baseline_old_geometry": {
            "source": "fused_cg_125k.json / northstar_125k.json (W=384 R=256)",
            "fused_cg5_ms": 59.9,
            "unfused_matvec_ms_per_apply": 6.64,
        },
        "method": "slope (T24-T4)/20, two passes averaged",
    }
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "geometry_cg5_125k.json"
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
