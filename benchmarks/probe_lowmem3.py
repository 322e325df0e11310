"""Validate the integrated low-memory large-N solve paths on the real chip.

Drives the PRODUCTION entry points (core.lattice._jit_settle_donated,
_jit_solve_ustar, models.coherence.solve_stationary_chunked) with a
synthetic k-sparse graph at 500k/1M x 768 x k8 — solve cost depends on
shapes/regimes, not edge values; iteration counts are reported next to every
time.  Numbers to beat (benchmarks/scale_tpu.json rows_round3, the
pre-round-3 column-chunked path): settle 2292 ms / U* 2849 ms at 500k (c=2),
settle 4452 ms / U* 5455 ms at 1M (c=8).

Run detached: 1M-shape remote compiles can exceed tool timeouts.
"""

import json
import time

import jax
import jax.numpy as jnp

from oscillink_tpu.core import lattice as latmod
from oscillink_tpu.models.coherence import EnergyParams, solve_stationary_chunked
from oscillink_tpu.ops.graph import Graph

OUT = "benchmarks/probe_lowmem3.json"
res = {}


def save():
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


def synth(n, d, k, seed=0):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    Y = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    idx = jax.random.randint(k2, (n, k), 0, n, dtype=jnp.int32)
    wn = jax.random.uniform(k3, (n, k), dtype=jnp.float32) * 0.1
    sqrt_deg = jnp.sqrt(jnp.maximum(jnp.sum(wn, axis=1), 1e-12))
    g = Graph(idx=idx, w=wn, wn=wn, sqrt_deg=sqrt_deg)
    psi = jax.random.normal(k4, (d,), dtype=jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    B = jnp.ones((n,), dtype=jnp.float32)
    jax.block_until_ready((Y, g.idx, g.wn))
    return Y, g, psi, B


def timed(fn, label, reps=3):
    """Cold + warm wall-clocks; completion proven by a data-dependent scalar
    fetch of the result's iters (sync through this tunnel can lie)."""
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


def run_scale(n, d=768, k=8):
    tag = f"n{n}"
    print(f"\n=== N={n} ===", flush=True)
    Y, g, psi, B = synth(n, d, k)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)
    s_opts = jnp.asarray([1.0, 1e-3, 12.0], dtype=jnp.float32)
    u_opts = jnp.asarray([1e-4, 64.0], dtype=jnp.float32)

    # 1) full-width donated settle (new 500k/1M route; U consumed per call)
    def settle_donated():
        U = Y * 1.01  # distinct buffer, recreated per rep (donated away)
        return latmod._jit_settle_donated(
            g, None, U, Y, psi, B, lam, s_opts, None, True
        )

    try:
        res[f"{tag}_settle_donated_fullwidth"] = timed(
            settle_donated, f"settle donated full-width N={n}")
    except Exception as e:  # noqa: BLE001
        res[f"{tag}_settle_donated_fullwidth"] = f"failed: {type(e).__name__}"
        print(f"settle donated N={n} FAILED: {str(e)[:300]}", flush=True)
    save()

    # 2) full-width U* solve, fresh-lattice case (U aliases Y -> resident 1)
    def ustar_full():
        return latmod._jit_solve_ustar(g, None, Y, psi, B, lam, u_opts)

    try:
        res[f"{tag}_ustar_fullwidth"] = timed(ustar_full, f"ustar full-width N={n}")
    except Exception as e:  # noqa: BLE001
        res[f"{tag}_ustar_fullwidth"] = f"failed: {type(e).__name__}"
        print(f"ustar full N={n} FAILED: {str(e)[:300]}", flush=True)
    save()

    # 3) chunked U* (distinct-U case at 1M routes to c=2 under the new model)
    if n >= 1_000_000:
        U_live = Y * 1.01  # pin a distinct U so the resident set is honest
        def ustar_c2():
            return solve_stationary_chunked(
                g, None, Y, psi, B, lam, tol=u_opts[0],
                max_iters=jnp.int32(64), col_chunks=2,
            )

        try:
            res[f"{tag}_ustar_chunked2"] = timed(ustar_c2, f"ustar chunked c=2 N={n}")
        except Exception as e:  # noqa: BLE001
            res[f"{tag}_ustar_chunked2"] = f"failed: {type(e).__name__}"
            print(f"ustar c2 N={n} FAILED: {str(e)[:300]}", flush=True)
        del U_live
    save()
    del Y, g, psi, B


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    run_scale(500_000)
    run_scale(1_000_000)
    print(json.dumps(res), flush=True)
    save()


if __name__ == "__main__":
    main()
