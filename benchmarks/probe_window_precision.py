"""Measure the opt-in window-pass precision tiers on the real chip.

NORTHSTAR.md's speed-of-light section ESTIMATED "bf16x2 window passes
≈ −1 ms/apply at ~1e-3 matmul error" as the documented fallback if a future
target needs <50 ms — an estimate, not a measurement.  This probe measures
it, at the exact 1M/8 shard geometry (125k x 768 x k=8, locality-ordered,
same generator and slope protocol as probe_northstar.py):

  * windowed matvec ms/apply for precision in {bf16x3, bf16x2, bf16}
  * the fused 5-iteration CG body (cg_solve_kpap program shape) per tier
  * accuracy: matvec relative error vs the f32-grade bf16x3 tier, and the
    CG solution drift after 5 iterations

Writes benchmarks/window_precision_125k.json.
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
TIERS = ("bf16x3", "bf16x2", "bf16")


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

    cache = "/tmp/ns125_plan.npz"
    if os.path.exists(cache) and all(
        f in np.load(cache) for f in ws.WindowPlan._fields
    ):
        z = np.load(cache)
        plan = ws.WindowPlan(**{f: jnp.asarray(z[f]) for f in ws.WindowPlan._fields})
        cov = float(z["cov"])
        print(f"# window plan loaded from cache (cov={cov:.4f})", flush=True)
    else:
        plan, cov = ws.build_window_plan(idx, wn, W=384, n_windows=3)
        np.savez(
            cache, cov=cov, plan_ms=0.0,
            **{f: np.asarray(getattr(plan, f)) for f in plan._fields},
        )
        print(f"# window plan built (cov={cov:.4f})", flush=True)
    oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))

    X = jnp.asarray(rng.standard_normal((plan.n_pad, D)).astype(np.float32))
    B = jnp.asarray(rng.random(plan.n_pad).astype(np.float32))
    lamG, lamC, lamQ = 1.0, 0.5, 4.0
    s = lamC
    g = jnp.asarray(((lamG + lamC + lamQ * np.asarray(B)) / s).astype(np.float32))[
        :, None
    ]

    # -- accuracy: one apply per tier against bf16x3 ----------------------
    outs = {}
    for tier in TIERS:
        out, _ = jax.jit(
            functools.partial(ws.k_matvec_windowed, precision=tier)
        )(plan, oh, X, g)
        outs[tier] = np.asarray(jax.device_get(out))
    scale = np.abs(outs["bf16x3"]).max() + 1e-12
    acc = {
        t: float(np.abs(outs[t] - outs["bf16x3"]).max() / scale)
        for t in ("bf16x2", "bf16")
    }
    print(f"# matvec rel vs bf16x3: {acc}", flush=True)

    # -- speed: matvec + fused cg5 body per tier ---------------------------
    def make_chain_mv(tier):
        @functools.partial(jax.jit, static_argnums=(4,))
        def chain(plan, oh, X, g, reps):
            def body(i, acc):
                out, _ = ws.k_matvec_windowed(plan, oh, acc, g, precision=tier)
                return out * 0.999

            return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

        return chain

    def make_chain_cg5(tier):
        @functools.partial(jax.jit, static_argnums=(5,))
        def chain(plan, oh, b, g, Bv, reps):
            def K_mul(x):
                return ws.k_matvec_windowed(plan, oh, x, g, precision=tier)

            def cg5(b, x0):
                x = x0
                Kx, _ = K_mul(x)
                r = b - Kx * s
                p = r
                rz = jnp.sum(r * r, axis=0)

                def body(i, carry):
                    x, r, p, rz = carry
                    Kp, pkp = K_mul(p)
                    denom = pkp * s + 1e-18
                    alpha = rz / denom
                    x = x + p * alpha
                    r = r - Kp * (alpha * s)
                    rz_new = jnp.sum(r * r, axis=0)
                    beta = rz_new / (rz + 1e-18)
                    p = r + p * beta
                    return (x, r, p, rz_new)

                x, r, p, rz = lax.fori_loop(0, 5, body, (x, r, p, rz))
                return x

            def body(i, x):
                return cg5(b, x * 0.999)

            return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

        return chain

    rows = {}
    for tier in TIERS:
        # construct each jitted chain ONCE and reuse it across timed calls:
        # a fresh jax.jit wrapper per call would re-trace inside the timing
        # window and drown the slope in host-side noise
        chain_mv = make_chain_mv(tier)
        chain_cg5 = make_chain_cg5(tier)
        mv_ms = slope(lambda r: chain_mv(plan, oh, X, g, r))
        print(f"# {tier} matvec: {mv_ms:.3f} ms/apply", flush=True)
        cg_ms = slope(lambda r: chain_cg5(plan, oh, X, g, B, r))
        print(f"# {tier} fused cg5: {cg_ms:.3f} ms/solve", flush=True)
        rows[tier] = {"matvec_ms_per_apply": round(mv_ms, 3), "cg5_ms": round(cg_ms, 3)}

    # -- CG solution drift after 5 iterations (bf16x2/bf16 vs bf16x3) ------
    def solve5(tier):
        @jax.jit
        def run(plan, oh, b, g):
            def K_mul(x):
                return ws.k_matvec_windowed(plan, oh, x, g, precision=tier)

            x = b
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

            x, _, _, _ = lax.fori_loop(0, 5, body, (x, r, p, rz))
            return x

        return np.asarray(jax.device_get(run(plan, oh, X, g)))

    x3 = solve5("bf16x3")
    xsc = np.abs(x3).max() + 1e-12
    drift = {
        t: float(np.abs(solve5(t) - x3).max() / xsc) for t in ("bf16x2", "bf16")
    }
    print(f"# cg5 solution drift vs bf16x3: {drift}", flush=True)

    out = {
        "config": f"N={N} (1M/8 shard) D={D} k={K}, locality-ordered",
        "device": str(jax.devices()[0].device_kind),
        "plan_coverage": round(cov, 4),
        "tiers": rows,
        "matvec_rel_vs_bf16x3": {k: round(v, 6) for k, v in acc.items()},
        "cg5_solution_drift_vs_bf16x3": {k: round(v, 6) for k, v in drift.items()},
        "method": "slope (T24-T4)/20, two passes averaged; fused cg5 = "
        "6 k_matvec applies + 5 update rounds (cg_solve_kpap shape)",
    }
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "window_precision_125k.json"
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
