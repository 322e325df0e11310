"""Bisect WHICH structural feature makes the full-width 1M solve
ResourceExhausted at compile time, when probe_lowmem2's cg5 (fori_loop,
scalar output, same 4-block live set) ran fine.

Variants (all: production Graph/lap_matvec, lamG/lamC/lamQ operator, Jacobi):
  A fori5_scalarout  — fixed 5 iters, returns sum(x[:8,:8])   (= probe2, sanity)
  B fori5_fullout    — fixed 5 iters, returns full [N, D] x
  C while_fullout_nores — while_loop on iter count only, full x
  D while_fullout    — shipped cg_solve_lowmem (res norm + tol cond), full x

Run detached.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from oscillink_tpu.models.coherence import EnergyParams, query_rhs, stationary_matvec
from oscillink_tpu.ops.graph import Graph
from oscillink_tpu.ops.solver import cg_solve_lowmem

OUT = "benchmarks/probe_bisect_1m.json"
res = {}


def save():
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


def fused_cg_fori(M_mul, rhs, x0, inv_M, iters):
    x = x0
    r = rhs - M_mul(x)
    rz = jnp.sum(r * (r * inv_M[:, None]), axis=0)
    p = r * inv_M[:, None]

    def body(i, carry):
        x, r, p, rz = carry
        Ap = M_mul(p)
        alpha = rz / (jnp.sum(p * Ap, axis=0) + 1e-18)
        x = x + p * alpha
        r = r - Ap * alpha
        rz_new = jnp.sum(r * (r * inv_M[:, None]), axis=0)
        beta = rz_new / (rz + 1e-18)
        p = r * inv_M[:, None] + p * beta
        return (x, r, p, rz_new)

    x, r, p, rz = lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


def fused_cg_while_nores(M_mul, rhs, x0, inv_M, iters):
    x = x0
    r = rhs - M_mul(x)
    rz = jnp.sum(r * (r * inv_M[:, None]), axis=0)
    p = r * inv_M[:, None]

    def cond(c):
        return c[4] < iters

    def body(c):
        x, r, p, rz, it = c
        Ap = M_mul(p)
        alpha = rz / (jnp.sum(p * Ap, axis=0) + 1e-18)
        x = x + p * alpha
        r = r - Ap * alpha
        rz_new = jnp.sum(r * (r * inv_M[:, None]), axis=0)
        beta = rz_new / (rz + 1e-18)
        p = r * inv_M[:, None] + p * beta
        return (x, r, p, rz_new, it + 1)

    x, *_ = lax.while_loop(cond, body, (x, r, p, rz, jnp.int32(0)))
    return x


def try_one(name, fn, fetch_scalar):
    try:
        t0 = time.perf_counter()
        out = fn()
        v = float(jax.device_get(fetch_scalar(out)))
        cold = (time.perf_counter() - t0) * 1000
        t0 = time.perf_counter()
        out = fn()
        v = float(jax.device_get(fetch_scalar(out)))
        warm = (time.perf_counter() - t0) * 1000
        print(f"{name:26s} OK cold={cold:.0f} warm={warm:.1f} ms val={v:.3f}",
              flush=True)
        res[name] = {"cold_ms": round(cold, 1), "warm_ms": round(warm, 1)}
    except Exception as e:  # noqa: BLE001
        print(f"{name:26s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        res[name] = f"failed: {type(e).__name__}"
    save()


def main():
    n, d, k = 1_000_000, 768, 8
    print(f"device: {jax.devices()[0]}  N={n}", flush=True)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    Y = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    idx = jax.random.randint(k2, (n, k), 0, n, dtype=jnp.int32)
    wn = jax.random.uniform(k3, (n, k), dtype=jnp.float32) * 0.1
    sqrt_deg = jnp.sqrt(jnp.maximum(jnp.sum(wn, axis=1), 1e-12))
    g = Graph(idx=idx, w=wn, wn=wn, sqrt_deg=sqrt_deg)
    psi = jax.random.normal(k4, (d,), dtype=jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    B = jnp.ones((n,), dtype=jnp.float32)
    jax.block_until_ready((Y, g.idx, g.wn))
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)

    def make(core, full_out):
        @jax.jit
        def run(Y, idx, wn, sd, psi, B):
            gg = Graph(idx=idx, w=wn, wn=wn, sqrt_deg=sd)
            rhs = query_rhs(lam, Y, psi, B)
            inv_M = 1.0 / (lam.lamG + lam.lamQ * B + 1e-12)
            M_mul = lambda X: stationary_matvec(gg, None, lam, B, X)  # noqa: E731
            x = core(M_mul, rhs, Y, inv_M, 5)
            return x if full_out else jnp.sum(x[:8, :8])

        return lambda: run(Y, g.idx, g.wn, g.sqrt_deg, psi, B)

    try_one("A_fori5_scalarout", make(fused_cg_fori, False),
            lambda o: o)
    try_one("B_fori5_fullout", make(fused_cg_fori, True),
            lambda o: jnp.sum(o[:8, :8]))
    try_one("C_while_fullout_nores", make(fused_cg_while_nores, True),
            lambda o: jnp.sum(o[:8, :8]))

    def make_d():
        @jax.jit
        def run(Y, idx, wn, sd, psi, B):
            gg = Graph(idx=idx, w=wn, wn=wn, sqrt_deg=sd)
            rhs = query_rhs(lam, Y, psi, B)
            M_diag = lam.lamG + lam.lamQ * B
            M_mul = lambda X: stationary_matvec(gg, None, lam, B, X)  # noqa: E731
            return cg_solve_lowmem(M_mul, rhs, x0=Y, M_diag=M_diag,
                                   tol=1e-4, max_iters=5)

        return lambda: run(Y, g.idx, g.wn, g.sqrt_deg, psi, B)

    try_one("D_while_fullout_shipped", make_d(),
            lambda o: jnp.sum(o[0][:8, :8]))
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
