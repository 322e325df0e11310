"""The REAL-graph north-star settle under the dma16 tier.

northstar_e2e_125k.json measured the production fused cg5 at 74.88 ms on
the real clustered 1M/8 shard graph (coverage 0.067, s_max 512 — 93% of
edges on the straggler path).  dma16_125k.json then measured the
bf16-stored contribution buffer cutting the straggler-bound regime ~20%
on an isotropic graph.  This probe reproduces the E2E probe's corpus,
graph, and settle stage EXACTLY (same seed, same shard-local slice, same
plan geometry, same fused cg5 body) and measures the settle under
bf16x3 / oh16 / dma16 in one process — the number that replaces 74.88 in
the per-chip E2E budget when the operator runs the opt-in tier.

Writes benchmarks/e2e_settle_dma16_125k.json.
Run detached:
  nohup python benchmarks/probe_e2e_settle_dma16.py > /tmp/e2esettle16.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OSCILLINK_COMPILE_CACHE_DIR", "/tmp/oscillink_jaxcache")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from oscillink_tpu.utils.compile_cache import configure_compile_cache

configure_compile_cache()

N_FULL, N_SLICE, D, K = 1_000_000, 125_000, 768, 8
W, R, NWIN = 384, 384, 3
LAMG, LAMC, LAMQ = 1.0, 0.5, 4.0


def slope(fn, r1, r2):
    for reps in (r1, r2):
        float(jax.device_get(fn(reps)))
    ts = []
    for reps in (r1, r2, r1, r2):
        t0 = time.perf_counter()
        float(jax.device_get(fn(reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    return ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / (r2 - r1)


def main():
    from oscillink_tpu.core.lattice import _jit_locality_order
    from oscillink_tpu.ops.graph import (
        DEFAULT_BLOCK_ROWS,
        _topk_blocked_fast,
        graph_from_topk,
        normalize_rows,
    )
    from oscillink_tpu.ops.pallas import window_spmv as ws

    rng = np.random.default_rng(0)  # SAME corpus as probe_northstar_e2e
    centers = rng.standard_normal((64, D)).astype(np.float32)
    assign = rng.integers(0, 64, size=N_FULL)
    Y = (centers[assign] + 0.35 * rng.standard_normal((N_FULL, D))).astype(
        np.float32
    )
    psi = (Y[:64].mean(0) / (np.linalg.norm(Y[:64].mean(0)) + 1e-12)).astype(
        np.float32
    )
    Yn = jax.jit(normalize_rows)(jnp.asarray(Y))
    order, _inv = _jit_locality_order(Yn)
    Yn = jax.block_until_ready(jnp.take(Yn, order, axis=0))
    del Y
    print("# corpus normalized + locality-ordered", flush=True)

    topk = jax.jit(
        lambda Yq, Yn: _topk_blocked_fast(
            Yq, Yn, K, DEFAULT_BLOCK_ROWS, recall_target=0.99, row_offset=0
        )
    )
    vals, idx = jax.block_until_ready(topk(Yn, Yn))
    g_full = graph_from_topk(vals, idx, row_cap=1.0)
    idx_s, w_s, wn_s = (
        np.asarray(a)
        for a in jax.device_get(
            [g_full.idx[:N_SLICE], g_full.w[:N_SLICE], g_full.wn[:N_SLICE]]
        )
    )
    in_shard = idx_s < N_SLICE
    rows_self = np.broadcast_to(
        np.arange(N_SLICE, dtype=np.int32)[:, None], idx_s.shape
    )
    idx_local = np.where(in_shard, idx_s, rows_self).astype(np.int32)
    wn_local = np.where(in_shard, wn_s, 0.0).astype(np.float32)
    print("# real 1M graph built; shard-local slice extracted", flush=True)

    plan, cov = ws.build_window_plan(idx_local, wn_local, W=W, R=R, n_windows=NWIN)
    s_max = ws.plan_s_max(plan)
    oh = ws.build_onehot(plan, W, s_max)
    oh16 = oh._replace(main=oh.main.astype(jnp.bfloat16))
    print(f"# plan coverage={float(cov):.4f} s_max={s_max}", flush=True)

    n_pad = plan.n_pad
    B = np.ones(N_SLICE, dtype=np.float32)
    Y_slice = jax.device_get(Yn[:N_SLICE])
    rhs_np = LAMG * np.asarray(Y_slice) + LAMQ * (B[:, None] * psi[None, :])
    rhs = ws.pad_rows(jnp.asarray(rhs_np), n_pad)
    s = LAMC
    gvec = ws.pad_rows(
        jnp.asarray(((LAMG + LAMC + LAMQ * B) / s).astype(np.float32)[:, None]),
        n_pad,
    )

    @functools.partial(jax.jit, static_argnums=(4, 5))
    def chain_cg5(plan, oh, b, g, reps, precision):
        def K_mul(x):
            return ws.k_matvec_windowed(
                plan, oh, x, g, W=W, R=R, precision=precision
            )

        def cg_body(b, x0):
            x = x0
            Kx, _ = K_mul(x)
            r = b - Kx * s
            p = r
            rz = jnp.sum(r * r, axis=0)

            def body(i, carry):
                x, r, p, rz = carry
                Kp, pkp = K_mul(p)
                alpha = rz / (pkp * s + 1e-18)
                x = x + p * alpha
                r = r - Kp * (alpha * s)
                rz_new = jnp.sum(r * r, axis=0)
                p = r + p * (rz_new / (rz + 1e-18))
                return (x, r, p, rz_new)

            x, r, p, rz = lax.fori_loop(0, 5, body, (x, r, p, rz))
            return x

        def body(i, x):
            return cg_body(b, x * 0.999)

        return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

    out = {
        "config": "1M/8 per-chip slice, REAL clustered graph (seed 0 — same "
        f"as northstar_e2e_125k), D={D} k={K}, W={W} R={R} n_windows={NWIN}",
        "plan_coverage": round(float(cov), 4),
        "plan_s_max": int(s_max),
        "anchor_bf16x3_from_e2e_probe_ms": 74.88,
        "method": "slope (T24-T4)/20, two passes averaged; all tiers one process",
    }
    for label, ohv, prec in (
        ("bf16x3", oh, "bf16x3"),
        ("oh16", oh16, "oh16"),
        ("dma16", oh16, "dma16"),
    ):
        ms = slope(lambda r: chain_cg5(plan, ohv, rhs, gvec, r, prec), 4, 24)
        out[f"settle_fused_cg5_ms_{label}"] = round(ms, 3)
        print(f"# fused cg5 {label}: {ms:.2f} ms", flush=True)

    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "e2e_settle_dma16_125k.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
