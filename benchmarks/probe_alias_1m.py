"""Does input->output buffer aliasing (donate_argnums) work through axon?

probe_bisect_1m proved the 4-block fused CG runs at 1M full width when the
jit returns a scalar (1111.6 ms / 5 iters) and is compile-rejected the
moment the full [N, D] solution is an un-aliased output.  If donation is
honored, a donated x0 gives the output a home and full-width fits; if not,
the 1M tier must stay column-chunked.  Also measures the production chunked
solves (c=2 / c=4) with the round-3 lowmem CG + k-loop matvec as the
fallback numbers.

Run detached.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from oscillink_tpu.core import lattice as latmod
from oscillink_tpu.models.coherence import (
    EnergyParams,
    query_rhs,
    settle_step_chunked,
    solve_stationary_chunked,
    stationary_matvec,
)
from oscillink_tpu.ops.graph import Graph

OUT = "benchmarks/probe_alias_1m.json"
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


def try_one(name, fn, fetch_scalar, reps=2):
    try:
        t0 = time.perf_counter()
        out = fn()
        v = float(jax.device_get(fetch_scalar(out)))
        cold = (time.perf_counter() - t0) * 1000
        warms = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            v = float(jax.device_get(fetch_scalar(out)))
            warms.append((time.perf_counter() - t0) * 1000)
        print(f"{name:30s} OK cold={cold:.0f} warm={min(warms):.1f} ms "
              f"val={v:.3f}", flush=True)
        res[name] = {"cold_ms": round(cold, 1), "warm_ms": round(min(warms), 1)}
    except Exception as e:  # noqa: BLE001
        print(f"{name:30s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
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

    # E: donated x0 -> full-width output has a home iff aliasing is honored
    @partial(jax.jit, donate_argnums=(0,))
    def solve_donated(X0, Y, idx, wn, sd, psi, B):
        gg = Graph(idx=idx, w=wn, wn=wn, sqrt_deg=sd)
        rhs = query_rhs(lam, Y, psi, B)
        inv_M = 1.0 / (lam.lamG + lam.lamQ * B + 1e-12)
        M_mul = lambda X: stationary_matvec(gg, None, lam, B, X)  # noqa: E731
        return fused_cg_fori(M_mul, rhs, X0, inv_M, 5)

    def run_donated():
        X0 = Y * 1.0  # fresh copy, consumed by donation
        return solve_donated(X0, Y, g.idx, g.wn, g.sqrt_deg, psi, B)

    try_one("E_fori5_fullout_donated", run_donated, lambda o: jnp.sum(o[:8, :8]))

    # F: production chunked U* (fresh-lattice resident set) at c=2 / c=4
    for c in (2, 4):
        def run_chunk(c=c):
            return solve_stationary_chunked(
                g, None, Y, psi, B, lam, tol=1e-4,
                max_iters=jnp.int32(64), col_chunks=c,
            )

        try_one(f"F_ustar_chunked{c}", run_chunk,
                lambda o: o[1], reps=2)

    # G: production chunked settle (donate_u) at c=2 / c=4
    for c in (2, 4):
        def run_settle(c=c):
            U = Y * 1.01
            return settle_step_chunked(
                g, None, U, Y, psi, B, lam, dt=1.0, tol=1e-3,
                max_iters=jnp.int32(12), col_chunks=c, donate_u=True,
            )

        try_one(f"G_settle_chunked{c}_donated", run_settle,
                lambda o: o[1], reps=2)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
