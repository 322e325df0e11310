"""Fused windowed operator on the real TPU: Mosaic parity + cg5 timing.

The fused kernel (`k_matvec_windowed`) folds the operator diagonal into the
window pass and emits the CG denominator ⟨p, Kp⟩ in-kernel, removing the
per-apply elementwise λ-combine (3 [N, D] HBM blocks) and the per-iteration
denominator reduction (2 blocks).  This probe
  1. parity-checks the Mosaic kernel (g-diag + pap outputs) against the
     composition identity at a TPU shape with mixed straggler arms;
  2. slope-times the fused 5-iteration CG body at the 125k × 768 × k8
     north-star shard against the committed unfused 69.2 ms.

Writes benchmarks/fused_cg_125k.json.
Run detached:  nohup python benchmarks/probe_fused_cg.py > /tmp/fused.log 2>&1 &
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


def parity():
    from oscillink_tpu.ops.pallas import window_spmv as ws

    rng = np.random.default_rng(1)
    n, d, k = 8192, 256, 6
    idx = (np.arange(n)[:, None] + rng.integers(-200, 200, size=(n, k))) % n
    idx[3000:3600] = rng.integers(0, n, size=(600, k))
    idx = idx.astype(np.int32)
    wn = (rng.random((n, k)) * 0.1).astype(np.float32)
    plan, cov = ws.build_window_plan(idx, wn, W=384, n_windows=3)
    oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)
    g = jnp.asarray((1.5 + rng.random(plan.n_pad)).astype(np.float32)[:, None])

    out, pap = ws.k_matvec_windowed(plan, oh, Xp, g)  # Mosaic path on TPU
    lap = ws.lap_matvec_windowed(plan, oh, Xp)
    ref = (g - 1.0) * Xp + lap
    rel = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-12))
    pap_ref = jnp.sum(Xp * ref, axis=0)
    prel = float(jnp.abs(pap - pap_ref).max() / (jnp.abs(pap_ref).max() + 1e-12))
    print(f"# fused parity: out rel={rel:.2e} pap rel={prel:.2e} cov={cov:.4f}",
          flush=True)
    assert rel < 5e-5 and prel < 5e-4, (rel, prel)
    return {"out_rel": rel, "pap_rel": prel, "coverage": cov}


def measure():
    from oscillink_tpu.ops.pallas import window_spmv as ws
    from oscillink_tpu.ops.solver import cg_solve_kpap

    N, D, K = 125_000, 768, 8
    rng = np.random.default_rng(0)
    idx = ((np.arange(N)[:, None] + rng.integers(-400, 400, size=(N, K))) % N
           ).astype(np.int32)
    wn = (rng.random((N, K)) * 0.1).astype(np.float32)
    plan, cov = ws.build_window_plan(idx, wn, W=384, n_windows=3)
    oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
    X = jnp.asarray(rng.standard_normal((plan.n_pad, D)).astype(np.float32))
    B = jnp.asarray(
        np.pad(rng.random(N).astype(np.float32), (0, plan.n_pad - N))
    )
    lamG, lamC, lamQ = 1.0, 0.5, 4.0

    # fused matvec alone
    g = ((lamG + lamC + lamQ * B) / lamC)[:, None]

    @functools.partial(jax.jit, static_argnums=(4,))
    def chain_k(plan, oh, X, g, reps):
        def body(i, acc):
            out, _ = ws.k_matvec_windowed(plan, oh, acc, g)
            return out * 0.999

        return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

    k_ms = slope(lambda r: chain_k(plan, oh, X, g, r))
    print(f"# fused matvec+pap: {k_ms:.3f} ms/apply (unfused matvec 6.64, "
          f"but replaces matvec + 3-block combine)", flush=True)

    # the full fused 5-iteration CG body as one program (same protocol as
    # probe_northstar's cg5: fixed 5 iterations via max_iters, tol=0 so the
    # while_loop never exits early; includes the initial-residual apply)
    @functools.partial(jax.jit, static_argnums=(4,))
    def chain_cg5(plan, oh, b, g, reps):
        def K_mul(x):
            return ws.k_matvec_windowed(plan, oh, x, g)

        def body(i, x):
            sol, _, _ = cg_solve_kpap(
                K_mul, lamC, b, x0=x * 0.999, M_diag=None, tol=0.0, max_iters=5
            )
            return sol

        return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

    cg5_ms = slope(lambda r: chain_cg5(plan, oh, X, g, r))
    print(f"# cg5 fused windowed: {cg5_ms:.3f} ms/solve "
          f"(committed unfused: 69.2)", flush=True)
    return {
        "fused_matvec_pap_ms_per_apply": round(k_ms, 3),
        "cg5_fused_windowed_ms": round(cg5_ms, 3),
        "coverage": round(float(cov), 4),
        "committed_unfused": {
            "windowed_matvec_ms_per_apply": 6.64,
            "cg5_windowed_ms": 69.2,
            "source": "northstar_125k.json",
        },
        "config": "N=125k D=768 k=8 locality-ordered (+-400), W=384x3 R=256",
        "program": "6 fused operator applies (diag+pap in-kernel) + "
                   "5 x/r/p update rounds",
    }


def main():
    out = {"parity": parity(), "measure": measure()}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fused_cg_125k.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
