"""1M re-run of probe_lowmem3 with cg_solve_lowmem routed (the classic CG's
z-block ResourceExhausted'd both full-width 1M solves).  Measures the
production entry points: donated full-width settle, full-width U* (fresh-
lattice resident set), and the chunked c=2 U* fallback (distinct-U case).

Run detached; 1M remote compiles are minutes.
"""

import json
import time

import jax
import jax.numpy as jnp

from oscillink_tpu.core import lattice as latmod
from oscillink_tpu.models.coherence import EnergyParams, solve_stationary_chunked
from oscillink_tpu.ops.graph import Graph

OUT = "benchmarks/probe_lowmem4.json"
res = {}


def save():
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


def timed(fn, label, reps=3):
    t0 = time.perf_counter()
    out = fn()
    it = int(jax.device_get(out[1]))
    cold = (time.perf_counter() - t0) * 1000
    warms = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        it = int(jax.device_get(out[1]))
        warms.append((time.perf_counter() - t0) * 1000)
    r = float(jax.device_get(out[2]))
    best = min(warms)
    print(f"{label:44s} cold={cold:8.0f}  warm={best:8.1f} ms  iters={it} "
          f"res={r:.2e}", flush=True)
    return {"cold_ms": round(cold, 1), "warm_ms": round(best, 1),
            "iters": it, "res": r}


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
    s_opts = jnp.asarray([1.0, 1e-3, 12.0], dtype=jnp.float32)
    u_opts = jnp.asarray([1e-4, 64.0], dtype=jnp.float32)

    def settle_donated():
        U = Y * 1.01
        return latmod._jit_settle_donated(
            g, None, U, Y, psi, B, lam, s_opts, None, True
        )

    try:
        res["settle_donated_fullwidth"] = timed(
            settle_donated, "settle donated full-width 1M")
    except Exception as e:  # noqa: BLE001
        res["settle_donated_fullwidth"] = f"failed: {type(e).__name__}"
        print(f"settle donated FAILED: {str(e)[:300]}", flush=True)
    save()

    def ustar_full():
        return latmod._jit_solve_ustar(g, None, Y, psi, B, lam, u_opts)

    try:
        res["ustar_fullwidth"] = timed(ustar_full, "ustar full-width 1M")
    except Exception as e:  # noqa: BLE001
        res["ustar_fullwidth"] = f"failed: {type(e).__name__}"
        print(f"ustar full FAILED: {str(e)[:300]}", flush=True)
    save()

    U_live = Y * 1.01  # distinct resident U, as in the settled-lattice case

    def ustar_c2():
        return solve_stationary_chunked(
            g, None, Y, psi, B, lam, tol=u_opts[0],
            max_iters=jnp.int32(64), col_chunks=2,
        )

    try:
        res["ustar_chunked2_distinctU"] = timed(ustar_c2, "ustar chunked c=2 (U resident)")
    except Exception as e:  # noqa: BLE001
        res["ustar_chunked2_distinctU"] = f"failed: {type(e).__name__}"
        print(f"ustar c2 FAILED: {str(e)[:300]}", flush=True)
    del U_live
    save()
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
