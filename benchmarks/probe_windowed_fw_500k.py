"""Does the FULL-WIDTH windowed solve fit (and win) at 500k? (round 5)

The chunked-solve gate (core/lattice.py _maybe_build_window_ctx) keys on
`_auto_col_chunks() > 1`, which models the PRE-round-3 solver; at 500k it
returns 2, so the windowed tier is disabled there and the settle runs the
XLA gather path (round-5 min-of-3: ~480-570 ms).  But the windowed solve
has NO [N, K, D] gather temps — its live set is the 4-5 CG blocks plus the
one-hot stream — so full width may fit where the old model says chunk:

  state 5 x [500k, 768] f32 = 7.7 GB + one-hot [n_pad, 1152] f32 2.3 GB
  (bf16/oh16: 1.15 GB) + resident operands ~3 GB  ->  ~11-13 GB on a
  16 GB chip: borderline, measure.

This probe builds the 500k window plan (aligned geometry W=R=384, 3
windows) and runs the fused cg5 full-width — fits-or-ResourceExhausted,
then ms/solve vs the measured gather walls, f32 one-hot and oh16 variants.

Writes benchmarks/windowed_fw_500k.json.
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
W, R, NWIN = 384, 384, 3
R1, R2 = 2, 8


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
    print(f"# plan: coverage={cov:.4f} s_max={s_max} n_pad={plan.n_pad}",
          flush=True)

    X = jnp.asarray(rng.standard_normal((plan.n_pad, D)).astype(np.float32))
    B = jnp.asarray(rng.random(plan.n_pad).astype(np.float32))
    lamG, lamC, lamQ = 1.0, 0.5, 4.0
    s = lamC
    g = jnp.asarray(((lamG + lamC + lamQ * np.asarray(B)) / s).astype(np.float32))[
        :, None
    ]

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

    out = {
        "config": f"N={N} D={D} k={K}, W={W} R={R} n_windows={NWIN} "
                  "FULL-WIDTH fused cg5",
        "device": str(jax.devices()[0].device_kind),
        "plan_coverage": round(float(cov), 4),
        "gather_path_settle_ms_round5": "~480 (iso) / ~573 (clustered) "
                                        "min-of-3, scale_tpu.json rows_round5",
        "method": "slope (T8-T2)/6, two passes averaged",
    }

    try:
        ms = slope(make_cg5(oh, "bf16x3"))
        out["fused_cg5_fullwidth_ms_f32oh"] = round(ms, 2)
        print(f"# full-width fused cg5 (f32 oh): {ms:.2f} ms", flush=True)
    except Exception as e:  # ResourceExhausted etc.
        out["fused_cg5_fullwidth_ms_f32oh"] = f"failed: {type(e).__name__}"
        print(f"# f32-oh FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    try:
        oh16 = oh._replace(main=oh.main.astype(jnp.bfloat16))
        ms16 = slope(make_cg5(oh16, "oh16"))
        out["fused_cg5_fullwidth_ms_oh16"] = round(ms16, 2)
        print(f"# full-width fused cg5 (oh16):  {ms16:.2f} ms", flush=True)
    except Exception as e:
        out["fused_cg5_fullwidth_ms_oh16"] = f"failed: {type(e).__name__}"
        print(f"# oh16 FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "windowed_fw_500k.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
