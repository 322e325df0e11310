"""North-star component measurement at the TRUE per-chip shard size.

The 1M/v5e-8 budget (benchmarks/NORTHSTAR.md) shards 1M rows over 8 chips =
125,000 rows/chip.  This probe measures, on the one real chip, at exactly
125k x 768 x k=8:

  * windowed Pallas local matvec      — ms/apply (slope-timed)
  * XLA gather local matvec           — ms/apply (slope-timed)
  * the FULL fixed-5-iteration CG body as one program (6 operator applies +
    5 vector-update/reduction rounds), both matvec variants — ms/solve

Slope timing: chain R in {4, 24} repetitions inside one jit and regress
(T24 - T4)/20, which cancels the tunnel's RPC floor and survives the
lying-sync failure mode (see bench.py:sync_is_trustworthy).

Writes benchmarks/northstar_125k.json.  Run detached (cold compiles can
exceed interactive timeouts):  nohup python benchmarks/probe_northstar.py &
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


def slope(fn):
    for reps in (R1, R2):
        float(jax.device_get(fn(reps)))  # compile + warm
    ts = []
    for reps in (R1, R2, R1, R2):
        t0 = time.perf_counter()
        float(jax.device_get(fn(reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    return ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / (R2 - R1)


def main():
    from oscillink_tpu.ops.graph import Graph, lap_matvec
    from oscillink_tpu.ops.pallas import window_spmv as ws

    rng = np.random.default_rng(0)
    # locality-ordered neighbor structure — the regime the windowed tier
    # serves (same generator as bench.py matvec_100k, at the 125k shard size)
    idx = ((np.arange(N)[:, None] + rng.integers(-400, 400, size=(N, K))) % N).astype(
        np.int32
    )
    wn = (rng.random((N, K)) * 0.1).astype(np.float32)

    cache = "/tmp/ns125_plan.npz"
    if os.path.exists(cache) and all(
        f in np.load(cache) for f in ws.WindowPlan._fields
    ):
        z = np.load(cache)
        plan = ws.WindowPlan(
            **{f: jnp.asarray(z[f]) for f in ws.WindowPlan._fields}
        )
        cov = float(z["cov"])
        plan_ms = float(z["plan_ms"])
        oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
        print(f"# window plan loaded from cache (cov={cov:.4f})", flush=True)
    else:
        t0 = time.perf_counter()
        plan, cov = ws.build_window_plan(idx, wn, W=384, n_windows=3)
        oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
        plan_ms = 1000.0 * (time.perf_counter() - t0)
        np.savez(
            cache, cov=cov, plan_ms=plan_ms,
            **{f: np.asarray(getattr(plan, f)) for f in plan._fields},
        )
        print(f"# window plan: coverage={cov:.4f} build={plan_ms:.0f} ms", flush=True)

    g = Graph(
        idx=jnp.asarray(idx), w=jnp.asarray(wn), wn=jnp.asarray(wn),
        sqrt_deg=jnp.ones(N),
    )
    X = jnp.asarray(rng.standard_normal((plan.n_pad, D)).astype(np.float32))
    B = jnp.asarray(rng.random(plan.n_pad).astype(np.float32))
    lamG, lamC, lamQ = 1.0, 0.5, 4.0

    # -- bare matvec, both variants --------------------------------------
    @functools.partial(jax.jit, static_argnums=(1,))
    def chain_xla(X, reps):
        def body(i, acc):
            return lap_matvec(g, acc) * 0.999

        return jnp.sum(lax.fori_loop(0, reps, body, X[:N])[:8, :8])

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_win(plan, oh, X, reps):
        def body(i, acc):
            return ws.lap_matvec_windowed(plan, oh, acc) * 0.999

        return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

    xla_ms = slope(lambda r: chain_xla(X, r))
    print(f"# gather matvec: {xla_ms:.3f} ms/apply", flush=True)
    win_ms = slope(lambda r: chain_win(plan, oh, X, r))
    print(f"# windowed matvec: {win_ms:.3f} ms/apply", flush=True)

    # -- full 5-iteration CG body as ONE program --------------------------
    # stationary operator M X = lamG X + lamC L X + lamQ B ⊙ X; fixed 5
    # iterations (the measured count at tol 1e-3 across every scale);
    # includes the initial-residual apply: 6 applies + 5 update rounds.
    # operands (graph / plan / one-hots / gates) are passed as jit ARGUMENTS,
    # never closed over — the tunnel's remote-compile endpoint rejects
    # programs with large embedded constants (HTTP 413).
    def make_cg5(apply_L):
        @functools.partial(jax.jit, static_argnums=(3,))
        def chain(ops, Bv, b, reps):
            def A_mul(x):
                return lamG * x + lamC * apply_L(ops, x) + lamQ * (Bv[:, None] * x)

            def cg5(b, x0):
                x = x0
                r = b - A_mul(x)
                p = r  # Jacobi omitted: diag is uniform here, cost identical
                rz = jnp.sum(r * r, axis=0)

                def body(i, carry):
                    x, r, p, rz = carry
                    Ap = A_mul(p)
                    denom = jnp.sum(p * Ap, axis=0) + 1e-18
                    alpha = rz / denom
                    x = x + p * alpha
                    r = r - Ap * alpha
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

    cg5_xla = make_cg5(lambda ops, x: lap_matvec(ops, x))
    cg5_xla_ms = slope(lambda r: cg5_xla(g, B[:N], X[:N], r))
    print(f"# cg5 gather: {cg5_xla_ms:.3f} ms/solve", flush=True)

    cg5_win = make_cg5(lambda ops, x: ws.lap_matvec_windowed(ops[0], ops[1], x))
    cg5_win_ms = slope(lambda r: cg5_win((plan, oh), B, X, r))
    print(f"# cg5 windowed: {cg5_win_ms:.3f} ms/solve", flush=True)

    out = {
        "config": f"N={N} (1M/8 shard) D={D} k={K}, locality-ordered",
        "device": str(jax.devices()[0].device_kind),
        "plan_coverage": round(cov, 4),
        "gather_matvec_ms_per_apply": round(xla_ms, 3),
        "windowed_matvec_ms_per_apply": round(win_ms, 3),
        "cg5_gather_ms": round(cg5_xla_ms, 3),
        "cg5_windowed_ms": round(cg5_win_ms, 3),
        "cg5_program": "6 operator applies + 5 vector-update/reduction rounds",
        "derived": {
            "cg5_gather_per_iter_ms": round(cg5_xla_ms / 5, 3),
            "cg5_windowed_per_iter_ms": round(cg5_win_ms / 5, 3),
            "updates_overhead_gather_ms": round(cg5_xla_ms - 6 * xla_ms, 3),
            "updates_overhead_windowed_ms": round(cg5_win_ms - 6 * win_ms, 3),
        },
        "method": "slope (T24-T4)/20, two passes averaged",
    }
    with open("benchmarks/northstar_125k.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
