"""Fresh-process-per-config measurement of the 1M chunked solves.

probe_alias_1m established (a) donation/input-output aliasing is NOT honored
through the axon remote-compile backend — every full-width [N, D]-output
program pays an un-aliased +3.07 GB output block at 1M and is
compile-rejected; (b) a failed attempt leaks device buffers, so each config
must run in its own process (driver mode re-execs this script per config).

Configs (production entry points, lowmem CG + k-loop matvec underneath):
  ustar_c2 / ustar_c4       solve_stationary_chunked, fresh-lattice resident set
  settle_c2 / settle_c4     settle_step_chunked donate_u=True (distinct U)

Numbers to beat (scale_tpu.json rows_round3, c=8 classic): settle 4451.5 ms,
U* 5455.1 ms.
"""

import json
import os
import subprocess
import sys
import time

CONFIGS = ["ustar_c4", "ustar_c2", "settle_c4", "settle_c2"]
OUT = "benchmarks/probe_chunked_1m.json"


def run_config(cfg):
    import jax
    import jax.numpy as jnp

    from oscillink_tpu.models.coherence import (
        EnergyParams,
        settle_step_chunked,
        solve_stationary_chunked,
    )
    from oscillink_tpu.ops.graph import Graph

    n, d, k = 1_000_000, 768, 8
    kind, c = cfg.split("_c")
    c = int(c)
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

    if kind == "ustar":
        def run():
            return solve_stationary_chunked(
                g, None, Y, psi, B, lam, tol=1e-4,
                max_iters=jnp.int32(64), col_chunks=c,
            )
    else:
        def run():
            U = Y * 1.01
            return settle_step_chunked(
                g, None, U, Y, psi, B, lam, dt=1.0, tol=1e-3,
                max_iters=jnp.int32(12), col_chunks=c, donate_u=True,
            )

    t0 = time.perf_counter()
    out = run()
    it = int(jax.device_get(out[1]))
    cold = (time.perf_counter() - t0) * 1000
    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        it = int(jax.device_get(out[1]))
        warms.append((time.perf_counter() - t0) * 1000)
    r = float(jax.device_get(out[2]))
    print(json.dumps({
        "cfg": cfg, "cold_ms": round(cold, 1), "warm_ms": round(min(warms), 1),
        "iters": it, "res": r,
    }), flush=True)


def driver():
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)
    for cfg in CONFIGS:
        if cfg in res and isinstance(res[cfg], dict):
            continue
        print(f"--- {cfg}", flush=True)
        p = subprocess.run(
            [sys.executable, __file__, cfg],
            capture_output=True, text=True, timeout=1800,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode == 0 and line:
            res[cfg] = json.loads(line[-1])
            print(f"{cfg}: {res[cfg]}", flush=True)
        else:
            tail = (p.stderr or p.stdout).strip().splitlines()[-1:] or ["?"]
            res[cfg] = f"failed: {tail[-1][:160]}"
            print(f"{cfg} FAILED: {tail[-1][:200]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_config(sys.argv[1])
    else:
        driver()
