"""Does the windowed kernel's straggler path beat the gather on ISOTROPIC data?

The one-program E2E probe (northstar_e2e_125k.json) found that on a REAL
clustered 1M graph the window plan covers only 0.067 of edges — yet the
fused windowed cg5 still measured 74.9 ms, because the in-kernel straggler
path (compact contribution gather + exact-bf16 one-hot MXU segment-sum,
_matmul_kernel3) absorbed 93% of edges far cheaper than the per-row XLA
gather.  That reopens the isotropic question the round-4 ordering sweep
closed on coverage grounds (ivf_window_order_500k.json): coverage collapse
was assumed to mean the windowed tier is unusable, but the kernel's cost
degrades with straggler VOLUME, not with coverage per se.

This probe builds a REAL isotropic mutual-kNN graph at the 125k north-star
shard (production fast scan + graph_from_topk, natural order — no locality
structure at all), then measures in ONE process (same slope protocol as
probe_cg4.py, immune to tunnel drift and directly comparable to
cg4_125k.json):

  * windowed cg4, unfused  (apples-to-apples vs cg4_125k's gather arms)
  * windowed cg4, FUSED    (k_matvec_windowed — the production solve body)
  * windowed cg4, fused + oh16 one-hot tier
  * bf16-gather cg4 on the SAME graph (same-process A/B control)
  * one-apply parity of the windowed operator vs the gather reference
    (proves the plan is exact at ~0.01 coverage, not just fast)

If the fused windowed cg4 lands meaningfully under the committed 89.8 ms
bf16-gather number, the isotropic path should route through the windowed
kernel too, and the router's coverage bar becomes a memory/fits gate, not
a performance gate (verdict r4 item 4).

Writes benchmarks/iso_straggler_125k.json.
Run detached: nohup python benchmarks/probe_iso_straggler.py > /tmp/isostrag.log 2>&1 &
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


def make_cgN_unfused(apply_L, iters):
    @functools.partial(jax.jit, static_argnums=(3,))
    def chain(ops, Bv, b, reps):
        def A_mul(x):
            return LAMG * x + LAMC * apply_L(ops, x) + LAMQ * (Bv[:, None] * x)

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

            return lax.fori_loop(0, iters, body, (x, r, p, rz))[0]

        def body(i, x):
            return cgN(b, x * 0.999)

        return jnp.sum(lax.fori_loop(0, reps, body, b)[:8, :8])

    return chain


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

    rng = np.random.default_rng(7)
    Y = rng.standard_normal((N, D)).astype(np.float32)  # isotropic, no order
    Yn = jax.jit(normalize_rows)(jnp.asarray(Y))

    t0 = time.perf_counter()
    vals, idx = jax.block_until_ready(
        jax.jit(
            lambda Yq, Yk: _topk_blocked_fast(
                Yq, Yk, K, DEFAULT_BLOCK_ROWS, recall_target=0.99, row_offset=0
            )
        )(Yn, Yn)
    )
    g_full = graph_from_topk(vals, idx, row_cap=1.0)
    idx_np, wn_np = (np.asarray(a) for a in jax.device_get([g_full.idx, g_full.wn]))
    build_ms = 1000.0 * (time.perf_counter() - t0)
    print(f"# real iso graph built: {build_ms:.0f} ms (incl fetch)", flush=True)

    t0 = time.perf_counter()
    plan, cov = ws.build_window_plan(idx_np, wn_np, W=W, R=R, n_windows=NWIN)
    s_max = ws.plan_s_max(plan)
    oh = ws.build_onehot(plan, W, s_max)
    plan_ms = 1000.0 * (time.perf_counter() - t0)
    print(
        f"# plan: coverage={float(cov):.4f} s_max={s_max} "
        f"n_pad={plan.n_pad} build={plan_ms:.0f} ms",
        flush=True,
    )

    n_pad = plan.n_pad
    X = jnp.asarray(rng.standard_normal((n_pad, D)).astype(np.float32))
    B = jnp.asarray(rng.random(n_pad).astype(np.float32))

    out = {
        "config": f"N={N} (1M/8 shard) D={D} k={K}, REAL isotropic mutual-kNN "
        f"graph (production fast scan), natural order, W={W} R={R} "
        f"n_windows={NWIN}",
        "iters": ITERS,
        "plan_coverage": round(float(cov), 4),
        "plan_s_max": int(s_max),
        "plan_build_ms": round(plan_ms, 1),
        "method": "slope (T24-T4)/20, two passes averaged; all arms one process",
    }

    # ---- parity: one windowed apply vs the gather reference -------------
    lap_win = jax.jit(
        lambda p, o, x: ws.lap_matvec_windowed(p, o, x, W=W, R=R)
    )
    got = jax.device_get(lap_win(plan, oh, X))[:N]
    g = {"idx": jnp.asarray(idx_np), "wn": jnp.asarray(wn_np)}
    ref = jax.device_get(jax.jit(lap_gather_f32)(g, X[:N]))
    rel = float(
        np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-30)
    )
    out["apply_parity_rel"] = rel
    print(f"# windowed-vs-gather apply parity rel: {rel:.2e}", flush=True)

    # ---- single-apply walls ---------------------------------------------
    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_apply(p, o, x, reps):
        def body(i, carry):
            acc, x = carry
            y = ws.lap_matvec_windowed(p, o, x, W=W, R=R)
            return (acc + y[0, 0], x * 0.9999 + y * 1e-6)

        return lax.fori_loop(0, reps, body, (jnp.float32(0.0), x))[0]

    apply_ms = slope(lambda r: chain_apply(plan, oh, X, r))
    out["windowed_apply_ms"] = round(apply_ms, 3)
    print(f"# windowed apply (iso, cov {float(cov):.3f}): {apply_ms:.3f} ms",
          flush=True)

    # ---- windowed cg4, unfused ------------------------------------------
    cg_win = make_cgN_unfused(
        lambda ops, x: ws.lap_matvec_windowed(ops[0], ops[1], x, W=W, R=R),
        ITERS,
    )
    win_ms = slope(lambda r: cg_win((plan, oh), B, X, r))
    out["cg4_windowed_unfused_ms"] = round(win_ms, 3)
    print(f"# cg4 windowed unfused: {win_ms:.3f} ms/solve", flush=True)

    # ---- windowed cg4, FUSED (production body) ---------------------------
    s = LAMC
    gvec = (LAMG + LAMC + LAMQ * B) / s

    @functools.partial(jax.jit, static_argnums=(4,))
    def chain_cg4_fused(plan, ohs, b, gv, reps):
        gcol = gv[:, None]

        def K_mul(x):
            return ws.k_matvec_windowed(plan, ohs, x, gcol, W=W, R=R)

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

    fused_ms = slope(lambda r: chain_cg4_fused(plan, oh, X, gvec, r))
    out["cg4_windowed_fused_ms"] = round(fused_ms, 3)
    print(f"# cg4 windowed FUSED: {fused_ms:.3f} ms/solve", flush=True)

    # ---- fused + oh16 one-hot tier ---------------------------------------
    oh16 = ws.OneHots(main=oh.main.astype(jnp.bfloat16), strag=oh.strag)

    @functools.partial(jax.jit, static_argnums=(4,))
    def chain_cg4_oh16(plan, ohs, b, gv, reps):
        gcol = gv[:, None]

        def K_mul(x):
            return ws.k_matvec_windowed(
                plan, ohs, x, gcol, W=W, R=R, precision="oh16"
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

    oh16_ms = slope(lambda r: chain_cg4_oh16(plan, oh16, X, gvec, r))
    out["cg4_windowed_fused_oh16_ms"] = round(oh16_ms, 3)
    print(f"# cg4 windowed fused+oh16: {oh16_ms:.3f} ms/solve", flush=True)

    # ---- bf16-gather cg4 on the SAME graph (A/B control) -----------------
    Xr, Br = X[:N], B[:N]
    cg_b16 = make_cgN_unfused(lap_gather_bf16, ITERS)
    b16_ms = slope(lambda r: cg_b16(g, Br, Xr, r))
    out["cg4_bf16_gather_same_graph_ms"] = round(b16_ms, 3)
    print(f"# cg4 bf16-gather (same graph, A/B): {b16_ms:.3f} ms/solve",
          flush=True)

    out["committed_reference"] = {
        "cg4_bf16_gather_random_ms": 89.8,
        "cg4_f32_gather_random_ms": 100.4,
        "source": "cg4_125k.json (round 4; synthetic random neighbors)",
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "iso_straggler_125k.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
