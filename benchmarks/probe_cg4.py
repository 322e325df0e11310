"""Measured 4-iteration CG bodies at the 125k north-star shard.

The 1M-scale settles converge in 4 CG iterations at tol 1e-3 (measured,
scale_tpu.json), not the budget table's conservative 5.  VERDICT r3 item 2:
the isotropic-data fallback row in benchmarks/NORTHSTAR.md was composed
arithmetic (5x13.6 + 4x5.5), not a measurement.  This probe measures, as
ONE program each (same slope protocol as probe_northstar.py):

  * windowed cg4, locality-ordered data   (the primary tier at its real
    iteration count: 5 operator applies + 4 update rounds)
  * bf16-gather cg4, RANDOM neighbors     (the fallback that actually fires
    on isotropic corpora where windowed coverage collapses)
  * f32-gather cg4, RANDOM neighbors      (fallback without the bf16 mirror)

Writes benchmarks/cg4_125k.json.
Run detached:  nohup python benchmarks/probe_cg4.py > /tmp/cg4.log 2>&1 &
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
ITERS = 4


def slope(fn):
    for reps in (R1, R2):
        float(jax.device_get(fn(reps)))
    ts = []
    for reps in (R1, R2, R1, R2):
        t0 = time.perf_counter()
        float(jax.device_get(fn(reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    return ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / (R2 - R1)


def make_cgN(apply_L, iters, lamG=1.0, lamC=0.5, lamQ=4.0):
    """Fixed-iteration CG body: (iters+1) operator applies + iters update
    rounds, chained `reps` times inside one jit (probe_northstar protocol)."""

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain(ops, Bv, b, reps):
        def A_mul(x):
            return lamG * x + lamC * apply_L(ops, x) + lamQ * (Bv[:, None] * x)

        def cgN(b, x0):
            x = x0
            r = b - A_mul(x)
            p = r
            rz = jnp.sum(r * r, axis=0)

            def body(i, carry):
                x, r, p, rz = carry
                Ap = A_mul(p)
                alpha = rz / (jnp.sum(p * Ap, axis=0) + 1e-18)
                x = x + p * alpha
                r = r - Ap * alpha
                rz_new = jnp.sum(r * r, axis=0)
                p = r + p * (rz_new / (rz + 1e-18))
                return (x, r, p, rz_new)

            return lax.fori_loop(0, iters, body, (x, r, p, rz))[0]

        def body(i, x):
            return cgN(b, x * 0.999)

        return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

    return chain


def lap_gather_f32(g, X):
    acc = X
    for a in range(K):
        acc = acc - g["wn"][:, a][:, None] * jnp.take(X, g["idx"][:, a], axis=0)
    return acc


def lap_gather_bf16(g, X):
    Xb = X.astype(jnp.bfloat16)
    acc = X
    for a in range(K):
        rows = jnp.take(Xb, g["idx"][:, a], axis=0).astype(jnp.float32)
        acc = acc - g["wn"][:, a][:, None] * rows
    return acc


def main():
    from oscillink_tpu.ops.pallas import window_spmv as ws

    rng = np.random.default_rng(0)
    out = {
        "config": f"N={N} (1M/8 shard) D={D} k={K}",
        "iters": ITERS,
        "program": f"{ITERS + 1} operator applies + {ITERS} update rounds",
        "method": "slope (T24-T4)/20, two passes averaged",
    }

    # ---- windowed cg4, locality-ordered (primary tier) ------------------
    idx = ((np.arange(N)[:, None] + rng.integers(-400, 400, size=(N, K))) % N
           ).astype(np.int32)
    wn = (rng.random((N, K)) * 0.1).astype(np.float32)
    cache = "/tmp/ns125_plan.npz"
    if os.path.exists(cache) and all(
        f in np.load(cache) for f in ws.WindowPlan._fields
    ):
        z = np.load(cache)
        plan = ws.WindowPlan(**{f: jnp.asarray(z[f]) for f in ws.WindowPlan._fields})
        cov = float(z["cov"])
    else:
        plan, cov = ws.build_window_plan(idx, wn, W=384, n_windows=3)
    oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
    X = jnp.asarray(rng.standard_normal((plan.n_pad, D)).astype(np.float32))
    B = jnp.asarray(rng.random(plan.n_pad).astype(np.float32))

    cg_win = make_cgN(lambda ops, x: ws.lap_matvec_windowed(ops[0], ops[1], x),
                      ITERS)
    win_ms = slope(lambda r: cg_win((plan, oh), B, X, r))
    print(f"# cg4 windowed (cov={cov:.4f}): {win_ms:.3f} ms/solve", flush=True)
    out["cg4_windowed_ms"] = round(win_ms, 3)
    out["windowed_plan_coverage"] = round(cov, 4)

    # ---- gather cg4 on RANDOM neighbors (isotropic fallback) ------------
    idx_r = rng.integers(0, N, size=(N, K)).astype(np.int32)
    wn_r = (rng.random((N, K)) * 0.1).astype(np.float32)
    g = {"idx": jnp.asarray(idx_r), "wn": jnp.asarray(wn_r)}
    Xr, Br = X[:N], B[:N]

    cg_b16 = make_cgN(lap_gather_bf16, ITERS)
    b16_ms = slope(lambda r: cg_b16(g, Br, Xr, r))
    print(f"# cg4 bf16-gather random: {b16_ms:.3f} ms/solve", flush=True)
    out["cg4_bf16_gather_random_ms"] = round(b16_ms, 3)

    cg_f32 = make_cgN(lap_gather_f32, ITERS)
    f32_ms = slope(lambda r: cg_f32(g, Br, Xr, r))
    print(f"# cg4 f32-gather random: {f32_ms:.3f} ms/solve", flush=True)
    out["cg4_f32_gather_random_ms"] = round(f32_ms, 3)

    out["committed_cg5"] = {
        "windowed": 69.195, "gather_f32_random": 120.488,
        "gather_bf16_random": 108.135,
        "source": "northstar_125k.json / gather_bf16_125k.json",
    }
    with open("benchmarks/cg4_125k.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
