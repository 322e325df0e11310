"""bf16 neighbor-gather: the remaining lever for the isotropic-data matvec.

The gather local matvec measures 15.1 ms/apply at the 125k-row shard size
(northstar_125k.json) — over the 1M/8-chip settle budget when the windowed
tier's coverage gate refuses (isotropic corpora).  The gather is
latency/traffic-bound (repo analysis; locality reordering is a measured
no-op), so the one remaining axis is BYTES PER GATHERED ROW: fetch the
neighbor rows from a bf16 mirror of X (half the traffic), accumulate in
f32.  Anchor/identity/diag terms stay f32 — only the neighbor sum is
quantized, and mutual-kNN weights are ≤ row_cap, bounding the term.

This probe measures, at 125k x 768 x k8 with RANDOM (isotropic) neighbors:
  * f32 gather matvec (baseline)          — slope ms/apply
  * bf16-mirror gather matvec             — slope ms/apply
  * 5-iteration CG body with each matvec  — slope ms/solve
  * accuracy: relative error of the bf16-matvec CG solution vs the f32 CG
    solution, and the deltaH relative delta — the numbers that decide
    whether this is shippable as the fallback tier.

Writes benchmarks/gather_bf16_125k.json.
Run detached: nohup python benchmarks/probe_gather_bf16.py > log 2>&1 &
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
        float(jax.device_get(fn(reps)))
    ts = []
    for reps in (R1, R2, R1, R2):
        t0 = time.perf_counter()
        float(jax.device_get(fn(reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    return ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / (R2 - R1)


def lap_f32(g, X):
    acc = X
    for a in range(K):
        acc = acc - g["wn"][:, a][:, None] * jnp.take(X, g["idx"][:, a], axis=0)
    return acc


def lap_bf16(g, X):
    """Neighbor rows gathered from a bf16 mirror; f32 accumulate."""
    Xb = X.astype(jnp.bfloat16)
    acc = X
    for a in range(K):
        rows = jnp.take(Xb, g["idx"][:, a], axis=0).astype(jnp.float32)
        acc = acc - g["wn"][:, a][:, None] * rows
    return acc


def make_cg5(apply_L, lamG=1.0, lamC=0.5, lamQ=4.0):
    @functools.partial(jax.jit, static_argnums=(3,))
    def chain(ops, Bv, b, reps):
        def A_mul(x):
            return lamG * x + lamC * apply_L(ops, x) + lamQ * (Bv[:, None] * x)

        def cg5(b, x0):
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

            return lax.fori_loop(0, 5, body, (x, r, p, rz))[0]

        def body(i, x):
            return cg5(b, x * 0.999)

        return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

    return chain


def main():
    rng = np.random.default_rng(0)
    # RANDOM neighbors — the isotropic regime where the windowed tier refuses
    idx = rng.integers(0, N, size=(N, K)).astype(np.int32)
    wn = (rng.random((N, K)) * 0.1).astype(np.float32)
    g = {"idx": jnp.asarray(idx), "wn": jnp.asarray(wn)}
    X = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    B = jnp.asarray(rng.random(N).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_f32(g, X, reps):
        def body(i, acc):
            return lap_f32(g, acc) * 0.999

        return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_b16(g, X, reps):
        def body(i, acc):
            return lap_bf16(g, acc) * 0.999

        return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

    f32_ms = slope(lambda r: chain_f32(g, X, r))
    print(f"# f32 gather matvec: {f32_ms:.3f} ms/apply", flush=True)
    b16_ms = slope(lambda r: chain_b16(g, X, r))
    print(f"# bf16 gather matvec: {b16_ms:.3f} ms/apply", flush=True)

    cg5_f32 = make_cg5(lap_f32)
    cg5_f32_ms = slope(lambda r: cg5_f32(g, B, X, r))
    print(f"# cg5 f32: {cg5_f32_ms:.3f} ms/solve", flush=True)
    cg5_b16 = make_cg5(lap_bf16)
    cg5_b16_ms = slope(lambda r: cg5_b16(g, B, X, r))
    print(f"# cg5 bf16: {cg5_b16_ms:.3f} ms/solve", flush=True)

    # accuracy: one 5-iter solve each, compare solutions + deltaH
    @jax.jit
    def solve_pair(g, B, b):
        def mk(apply_L):
            def A_mul(x):
                return 1.0 * x + 0.5 * apply_L(g, x) + 4.0 * (B[:, None] * x)

            x = jnp.zeros_like(b)
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

            return lax.fori_loop(0, 5, body, (x, r, p, rz))[0]

        xa, xb = mk(lap_f32), mk(lap_bf16)
        num = jnp.linalg.norm(xa - xb)
        den = jnp.linalg.norm(xa) + 1e-12
        # deltaH-style quadratic form with the EXACT f32 operator on both
        def dH(x):
            diff = b * 0.01 - x * 0.01  # scaled gap proxy, same for both
            t = 1.0 * diff + 0.5 * lap_f32(g, diff) + 4.0 * (B[:, None] * diff)
            return jnp.sum(diff * t)

        return num / den, jnp.abs(dH(xa) - dH(xb)) / (jnp.abs(dH(xa)) + 1e-12)

    rel_u, rel_dh = (float(v) for v in jax.device_get(solve_pair(g, B, X)))
    print(f"# solution rel err: {rel_u:.2e}  deltaH rel delta: {rel_dh:.2e}",
          flush=True)

    out = {
        "config": f"N={N} D={D} k={K}, RANDOM neighbors (isotropic regime)",
        "f32_gather_ms_per_apply": round(f32_ms, 3),
        "bf16_gather_ms_per_apply": round(b16_ms, 3),
        "speedup": round(f32_ms / b16_ms, 3) if b16_ms > 0 else None,
        "cg5_f32_ms": round(cg5_f32_ms, 3),
        "cg5_bf16_ms": round(cg5_b16_ms, 3),
        "cg5_solution_rel_err": rel_u,
        "deltaH_rel_delta": rel_dh,
        "method": "slope (T24-T4)/20",
    }
    with open("benchmarks/gather_bf16_125k.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
