"""Measure the bf16-stored one-hot tier (oh16) at the 1M/8 shard (verdict #5).

NORTHSTAR.md attributes the windowed kernel's remaining ~1.1 ms/apply gap to
its streaming bound to the per-iteration [Npad, n_win*W] one-hot stream plus
straggler slabs.  The oh16 tier stores OneHots.main in bf16 — halving that
stream — and runs two MXU passes against the split X window (exact X, bf16
edge weights; ~2e-3 operator error, bf16x2-grade, opt-in).

Measures at 125k x 768 x k8 (W=R=384, 3 windows, the production geometry):
  * unfused + fused matvec ms/apply and fused cg5, default tier vs oh16;
  * operator relative error oh16 vs the f32-stored bf16x3 path.

Writes benchmarks/oh16_125k.json.
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
    oh16 = oh._replace(main=oh.main.astype(jnp.bfloat16))
    print(f"# plan: coverage={cov:.4f} s_max={s_max}", flush=True)

    X = jnp.asarray(rng.standard_normal((plan.n_pad, D)).astype(np.float32))
    B = jnp.asarray(rng.random(plan.n_pad).astype(np.float32))
    lamG, lamC, lamQ = 1.0, 0.5, 4.0
    s = lamC
    g = jnp.asarray(((lamG + lamC + lamQ * np.asarray(B)) / s).astype(np.float32))[
        :, None
    ]

    # correctness: one apply, oh16 vs default
    ref = jax.jit(
        lambda p, o, x: ws.lap_matvec_windowed(p, o, x, W=W, R=R)
    )(plan, oh, X)
    got = jax.jit(
        lambda p, o, x: ws.lap_matvec_windowed(p, o, x, W=W, R=R,
                                               precision="oh16")
    )(plan, oh16, X)
    rel = float(jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-30))
    print(f"# operator rel error oh16 vs bf16x3: {rel:.2e}", flush=True)

    def make_unfused(ohv, precision):
        @functools.partial(jax.jit, static_argnums=(3,))
        def chain(plan, ohv, X, reps):
            def body(i, acc):
                return ws.lap_matvec_windowed(
                    plan, ohv, acc, W=W, R=R, precision=precision
                ) * 0.999

            return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

        return lambda r: chain(plan, ohv, X, r)

    def make_cg5(ohv, precision):
        @functools.partial(jax.jit, static_argnums=(4,))
        def chain(plan, ohv, b, g, reps):
            def K_mul(x):
                return ws.k_matvec_windowed(
                    plan, ohv, x, g, W=W, R=R, precision=precision
                )

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

                x, r, p, rz = lax.fori_loop(0, 5, body, (x, r, p, rz))
                return x

            def body(i, x):
                return cg_body(b, x * 0.999)

            return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

        return lambda r: chain(plan, ohv, X, g, r)

    mv_f32 = slope(make_unfused(oh, "bf16x3"))
    print(f"# unfused bf16x3 (f32 oh): {mv_f32:.3f} ms/apply", flush=True)
    mv_16 = slope(make_unfused(oh16, "oh16"))
    print(f"# unfused oh16 (bf16 oh):  {mv_16:.3f} ms/apply", flush=True)
    cg5_f32 = slope(make_cg5(oh, "bf16x3"))
    print(f"# fused cg5 bf16x3: {cg5_f32:.2f} ms", flush=True)
    cg5_16 = slope(make_cg5(oh16, "oh16"))
    print(f"# fused cg5 oh16:   {cg5_16:.2f} ms", flush=True)

    out = {
        "config": f"N={N} (1M/8 shard) D={D} k={K}, W={W} R={R} n_windows={NWIN}",
        "device": str(jax.devices()[0].device_kind),
        "plan_coverage": round(float(cov), 4),
        "operator_rel_error": rel,
        "unfused_ms_bf16x3": round(mv_f32, 3),
        "unfused_ms_oh16": round(mv_16, 3),
        "fused_cg5_ms_bf16x3": round(cg5_f32, 3),
        "fused_cg5_ms_oh16": round(cg5_16, 3),
        "onehot_stream_gb_f32": round(plan.n_pad * NWIN * W * 4 / 1e9, 3),
        "method": "slope (T24-T4)/20, two passes averaged",
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "oh16_125k.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
