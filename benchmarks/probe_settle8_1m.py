"""Measure the production 1M warm-settle config the routing model picks:
settle_step_chunked c=8, distinct U, donate_u=True (resident Y+U -> c=4 is
the probe-rejected est-14.4 config, so `_auto_col_chunks_gather(2)` steps to
8).  Also re-confirms the fresh-lattice settle shape (U aliases Y -> c=4),
which is memory-equivalent to the measured ustar_c4 (2564.7 ms) but runs the
settle operator.

One config per process (a failed attempt leaks device buffers through the
axon backend); driver mode re-execs per config.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = ["settle_c8_distinct", "settle_c4_aliased"]
OUT = "benchmarks/probe_settle8_1m.json"


def run_config(cfg):
    import jax
    import jax.numpy as jnp

    from oscillink_tpu.models.coherence import EnergyParams, settle_step_chunked
    from oscillink_tpu.ops.graph import Graph

    n, d, k = 1_000_000, 768, 8
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

    if cfg == "settle_c8_distinct":
        def run():
            U = Y * 1.01
            return settle_step_chunked(
                g, None, U, Y, psi, B, lam, dt=1.0, tol=1e-3,
                max_iters=jnp.int32(12), col_chunks=8, donate_u=True,
            )
    else:  # fresh-lattice shape: U IS Y, no donation
        def run():
            return settle_step_chunked(
                g, None, Y, Y, psi, B, lam, dt=1.0, tol=1e-3,
                max_iters=jnp.int32(12), col_chunks=4, donate_u=False,
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
            capture_output=True, text=True, timeout=3000,
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
