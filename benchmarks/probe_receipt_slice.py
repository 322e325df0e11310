"""Per-chip full-receipt slice at the TRUE 1M/8 shard size (125k rows).

NORTHSTAR.md's 1M E2E budget (build + settle + receipt, the reference's
headline metric README.md:174-184) has chip measurements for the build slice
(1.46 s, sharded_build_slice_1m.json) and the settle (59.9 ms fused,
fused_cg_125k.json); the receipt term existed only as a SINGLE-CHIP 1M wall
(~4.8-17 s, scale_tpu.json / e2e_cachewarm.json).  Under the 8-way mesh each
chip computes the receipt over its 125k-row slice — deltaH operator apply,
per-node components (coherence drop / anchor / query), and the null-point
edge diagnostics — with only scalar psums and the capped null top-k crossing
chips.  This probe slope-times exactly that slice on the one real chip:

  * the complete `_jit_receipt_full` device body (core/lattice.py:213-227) at
    125k x 768 x k=8, chained R in {4, 24} reps inside one jit, (T24-T4)/20 —
    same protocol as probe_northstar.py, immune to the tunnel's RPC floor.
  * per-stage slopes for the three receipt sub-programs so the budget can
    attribute the cost (deltaH trace / per-node components / null points).

Writes benchmarks/receipt_slice_125k.json.
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

N, D, K = int(os.getenv("OSC_PROBE_N", "125000")), 768, 8
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
    from oscillink_tpu.models.coherence import EnergyParams
    from oscillink_tpu.ops.graph import Graph
    from oscillink_tpu.ops.receipts import (
        deltaH_trace,
        null_points_sparse,
        per_node_components,
    )

    rng = np.random.default_rng(0)
    # same shard geometry as probe_northstar.py: locality-ordered neighbors
    idx = ((np.arange(N)[:, None] + rng.integers(-400, 400, size=(N, K))) % N).astype(
        np.int32
    )
    w = (rng.random((N, K)) * 0.1).astype(np.float32)
    sqrt_deg = np.sqrt(np.maximum(w.sum(1), 1e-12)).astype(np.float32)
    wn = (w / (sqrt_deg[:, None] * sqrt_deg[idx] + 1e-12)).astype(np.float32)
    g = Graph(
        idx=jnp.asarray(idx),
        w=jnp.asarray(w),
        wn=jnp.asarray(wn),
        sqrt_deg=jnp.asarray(sqrt_deg),
    )
    Y = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    U = Y
    Ustar = jnp.asarray(
        np.asarray(Y) + 0.05 * rng.standard_normal((N, D)).astype(np.float32)
    )
    B = jnp.asarray(rng.random(N).astype(np.float32))
    psi = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    lam = EnergyParams.make(1.0, 0.5, 4.0)

    # operands passed as jit ARGUMENTS (never closed over): the tunnel's
    # remote-compile endpoint rejects large embedded constants (HTTP 413)
    def digest_full(g, U, Us, B, Y, psi):
        dH = deltaH_trace(g, None, U, Us, lam, B)
        coh, anchor, query = per_node_components(g, Y, Us, lam, B, psi)
        nflag, nj, nz, nr = null_points_sparse(g, Us, lam.lamC, z_th=3.0)
        return (
            dH
            + jnp.sum(coh)
            + jnp.sum(anchor)
            + jnp.sum(query)
            + jnp.sum(nz)
            + jnp.sum(nr)
            + jnp.sum(nflag)
        )

    def make_chain(digest):
        @functools.partial(jax.jit, static_argnums=(6,))
        def chain(g, U, Us, B, Y, psi, reps):
            def body(i, carry):
                acc, Us = carry
                # perturb U* per rep so no iteration can be hoisted/CSE'd
                return (acc + digest(g, U, Us, B, Y, psi), Us * 0.9995)

            acc, _ = lax.fori_loop(0, reps, body, (jnp.float32(0.0), Us))
            return acc

        return chain

    chain_full = make_chain(digest_full)
    full_ms = slope(lambda r: chain_full(g, U, Ustar, B, Y, psi, r))
    print(f"# receipt full slice: {full_ms:.2f} ms", flush=True)

    chain_dh = make_chain(
        lambda g, U, Us, B, Y, psi: deltaH_trace(g, None, U, Us, lam, B)
    )
    dh_ms = slope(lambda r: chain_dh(g, U, Ustar, B, Y, psi, r))
    print(f"# deltaH trace: {dh_ms:.2f} ms", flush=True)

    def digest_pnc(g, U, Us, B, Y, psi):
        coh, anchor, query = per_node_components(g, Y, Us, lam, B, psi)
        return jnp.sum(coh) + jnp.sum(anchor) + jnp.sum(query)

    chain_pnc = make_chain(digest_pnc)
    pnc_ms = slope(lambda r: chain_pnc(g, U, Ustar, B, Y, psi, r))
    print(f"# per-node components: {pnc_ms:.2f} ms", flush=True)

    def digest_np(g, U, Us, B, Y, psi):
        nflag, nj, nz, nr = null_points_sparse(g, Us, lam.lamC, z_th=3.0)
        return jnp.sum(nz) + jnp.sum(nr) + jnp.sum(nflag)

    chain_np = make_chain(digest_np)
    np_ms = slope(lambda r: chain_np(g, U, Ustar, B, Y, psi, r))
    print(f"# null points: {np_ms:.2f} ms", flush=True)

    out = {
        "config": f"N={N} (1M/8 shard) D={D} k={K}",
        "device": str(jax.devices()[0].device_kind),
        "receipt_full_slice_ms": round(full_ms, 2),
        "deltaH_trace_ms": round(dh_ms, 2),
        "per_node_components_ms": round(pnc_ms, 2),
        "null_points_ms": round(np_ms, 2),
        "program": "_jit_receipt_full body (core/lattice.py:213-227), "
        "scalar digest only — null cap / psums cross chips at 1M/8",
        "method": "slope (T24-T4)/20, two passes averaged",
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "receipt_slice_125k.json"
    )
    if N != 125_000:  # smoke runs (OSC_PROBE_N) never clobber the artifact
        out_path = "/tmp/receipt_slice_smoke.json"
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
