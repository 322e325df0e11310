"""dma16: does a bf16-STORED straggler contribution buffer close the iso gap?

iso_straggler_125k.json measured the windowed kernel on a REAL isotropic
mutual-kNN graph at the 125k north-star shard: coverage 0.019, s_max 2560,
fused cg4 165 ms — losing to the bf16-gather's 89.8 ms because the straggler
path dominates: every apply gathers the straggler contributions into an
[S, D] f32 buffer and every block re-DMAs an [s_max, D] f32 slab.  The oh16
tier (oh16_125k.json) already proved halving a dominant HBM stream converts
~1:1 into wall time on this DMA-bound kernel.  dma16 extends the same trade
to the straggler side: the contribution buffer is STORED bf16 (half the
gather write + half the per-block DMA) and the in-kernel correction becomes
a single exact-one-hot MXU pass (operator error ~2^-9, bf16x2/oh16 grade,
opt-in via OSCILLINK_WINDOW_PRECISION=dma16).

Measures in ONE process (slope protocol, directly comparable to
iso_straggler_125k.json — same graph seed):

  * REAL iso graph: windowed apply + fused cg4 at bf16x3 / oh16 / dma16,
    bf16-gather cg4 control, dma16 apply parity vs the f32 gather reference;
  * high-coverage locality plan (oh16 probe's graph): fused cg5 oh16 vs
    dma16 (sanity: few stragglers -> no regression expected).

Writes benchmarks/dma16_125k.json.
Run detached: nohup python benchmarks/probe_dma16.py > /tmp/dma16.log 2>&1 &
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

N, D, K = 125_000, 768, 8
W, R, NWIN = 384, 384, 3
R1, R2 = 4, 24
ITERS = 4
LAMG, LAMC, LAMQ = 1.0, 0.5, 4.0


def slope(fn):
    for reps in (R1, R2):
        float(jax.device_get(fn(reps)))
    ts = []
    for reps in (R1, R2, R1, R2):
        t0 = time.perf_counter()
        float(jax.device_get(fn(reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    return ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / (R2 - R1)


def lap_gather_bf16(g, X):
    Xb = X.astype(jnp.bfloat16)
    acc = X
    for a in range(K):
        rows = jnp.take(Xb, g["idx"][:, a], axis=0).astype(jnp.float32)
        acc = acc - g["wn"][:, a][:, None] * rows
    return acc


def lap_gather_f32(g, X):
    acc = X
    for a in range(K):
        acc = acc - g["wn"][:, a][:, None] * jnp.take(X, g["idx"][:, a], axis=0)
    return acc


def main():
    from oscillink_tpu.ops.graph import (
        DEFAULT_BLOCK_ROWS,
        _topk_blocked_fast,
        graph_from_topk,
        normalize_rows,
    )
    from oscillink_tpu.ops.pallas import window_spmv as ws

    rng = np.random.default_rng(7)  # SAME graph as probe_iso_straggler
    Y = rng.standard_normal((N, D)).astype(np.float32)
    Yn = jax.jit(normalize_rows)(jnp.asarray(Y))
    vals, idx = jax.block_until_ready(
        jax.jit(
            lambda Yq, Yk: _topk_blocked_fast(
                Yq, Yk, K, DEFAULT_BLOCK_ROWS, recall_target=0.99, row_offset=0
            )
        )(Yn, Yn)
    )
    g_full = graph_from_topk(vals, idx, row_cap=1.0)
    idx_np, wn_np = (np.asarray(a) for a in jax.device_get([g_full.idx, g_full.wn]))
    print("# real iso graph built", flush=True)

    plan, cov = ws.build_window_plan(idx_np, wn_np, W=W, R=R, n_windows=NWIN)
    s_max = ws.plan_s_max(plan)
    oh = ws.build_onehot(plan, W, s_max)
    oh16 = oh._replace(main=oh.main.astype(jnp.bfloat16))
    print(f"# plan: coverage={float(cov):.4f} s_max={s_max}", flush=True)

    n_pad = plan.n_pad
    X = jnp.asarray(rng.standard_normal((n_pad, D)).astype(np.float32))
    B = jnp.asarray(rng.random(n_pad).astype(np.float32))

    out = {
        "config": f"N={N} (1M/8 shard) D={D} k={K}, REAL isotropic mutual-kNN "
        f"graph (seed 7 — same as iso_straggler_125k), natural order, "
        f"W={W} R={R} n_windows={NWIN}",
        "iters": ITERS,
        "plan_coverage": round(float(cov), 4),
        "plan_s_max": int(s_max),
        "method": "slope (T24-T4)/20, two passes averaged; all arms one process",
    }

    # parity: dma16 apply vs f32 gather reference
    got = jax.device_get(
        jax.jit(
            lambda p, o, x: ws.lap_matvec_windowed(
                p, o, x, W=W, R=R, precision="dma16"
            )
        )(plan, oh16, X)
    )[:N]
    g = {"idx": jnp.asarray(idx_np), "wn": jnp.asarray(wn_np)}
    ref = jax.device_get(jax.jit(lap_gather_f32)(g, X[:N]))
    rel = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-30))
    out["dma16_apply_parity_rel"] = rel
    print(f"# dma16 apply parity rel vs f32 gather: {rel:.2e}", flush=True)

    # single-apply walls per tier
    @functools.partial(jax.jit, static_argnums=(3, 4))
    def chain_apply(p, o, x, reps, precision):
        def body(i, carry):
            acc, x = carry
            y = ws.lap_matvec_windowed(p, o, x, W=W, R=R, precision=precision)
            return (acc + y[0, 0], x * 0.9999 + y * 1e-6)

        return lax.fori_loop(0, reps, body, (jnp.float32(0.0), x))[0]

    for label, ohv, prec in (
        ("bf16x3", oh, "bf16x3"),
        ("oh16", oh16, "oh16"),
        ("dma16", oh16, "dma16"),
    ):
        ms = slope(lambda r: chain_apply(plan, ohv, X, r, prec))
        out[f"windowed_apply_ms_{label}"] = round(ms, 3)
        print(f"# windowed apply {label}: {ms:.3f} ms", flush=True)

    # fused cg4 per tier (production solve body)
    s = LAMC
    gvec = (LAMG + LAMC + LAMQ * B) / s

    @functools.partial(jax.jit, static_argnums=(4, 5))
    def chain_cg4_fused(plan, ohs, b, gv, reps, precision):
        gcol = gv[:, None]

        def K_mul(x):
            return ws.k_matvec_windowed(
                plan, ohs, x, gcol, W=W, R=R, precision=precision
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

            return lax.fori_loop(0, ITERS, body, (x, r, p, rz))[0]

        def body(i, x):
            return cg_body(b, x * 0.999)

        return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

    for label, ohv, prec in (
        ("bf16x3", oh, "bf16x3"),
        ("oh16", oh16, "oh16"),
        ("dma16", oh16, "dma16"),
    ):
        ms = slope(lambda r: chain_cg4_fused(plan, ohv, X, gvec, r, prec))
        out[f"cg4_fused_ms_{label}"] = round(ms, 3)
        print(f"# cg4 fused {label}: {ms:.3f} ms", flush=True)

    # same-process bf16-gather control (the committed iso tier)
    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_cg4_gather(g, Bv, b, reps):
        def A_mul(x):
            return (
                LAMG * x
                + LAMC * lap_gather_bf16(g, x)
                + LAMQ * (Bv[:, None] * x)
            )

        def cgN(b, x0):
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

            return lax.fori_loop(0, ITERS, body, (x, r, p, rz))[0]

        def body(i, x):
            return cgN(b, x * 0.999)

        return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

    gat_ms = slope(lambda r: chain_cg4_gather(g, B[:N], X[:N], r))
    out["cg4_bf16_gather_ms"] = round(gat_ms, 3)
    print(f"# cg4 bf16-gather control: {gat_ms:.3f} ms", flush=True)

    # ---- high-coverage sanity: locality plan, cg5, oh16 vs dma16 --------
    rng2 = np.random.default_rng(0)  # SAME graph as probe_oh16
    idx2 = (
        (np.arange(N)[:, None] + rng2.integers(-400, 400, size=(N, K))) % N
    ).astype(np.int32)
    wn2 = (rng2.random((N, K)) * 0.1).astype(np.float32)
    plan2, cov2 = ws.build_window_plan(idx2, wn2, W=W, R=R, n_windows=NWIN)
    s_max2 = ws.plan_s_max(plan2)
    oh2 = ws.build_onehot(plan2, W, s_max2)
    oh2_16 = oh2._replace(main=oh2.main.astype(jnp.bfloat16))
    X2 = jnp.asarray(rng2.standard_normal((plan2.n_pad, D)).astype(np.float32))
    B2 = jnp.asarray(rng2.random(plan2.n_pad).astype(np.float32))
    gvec2 = (LAMG + LAMC + LAMQ * B2) / s

    @functools.partial(jax.jit, static_argnums=(4, 5))
    def chain_cg5_fused(plan, ohs, b, gv, reps, precision):
        gcol = gv[:, None]

        def K_mul(x):
            return ws.k_matvec_windowed(
                plan, ohs, x, gcol, W=W, R=R, precision=precision
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

            return lax.fori_loop(0, 5, body, (x, r, p, rz))[0]

        def body(i, x):
            return cg_body(b, x * 0.999)

        return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

    out["highcov_plan_coverage"] = round(float(cov2), 4)
    out["highcov_plan_s_max"] = int(s_max2)
    for label, ohv, prec in (("oh16", oh2_16, "oh16"), ("dma16", oh2_16, "dma16")):
        ms = slope(lambda r: chain_cg5_fused(plan2, ohv, X2, gvec2, r, prec))
        out[f"highcov_cg5_fused_ms_{label}"] = round(ms, 3)
        print(f"# highcov cg5 fused {label}: {ms:.3f} ms", flush=True)

    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "dma16_125k.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
