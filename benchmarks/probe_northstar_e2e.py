"""ONE-PROGRAM north-star E2E slice at the exact 1M/8 geometry (verdict #3).

Rounds 3-4 measured the per-chip E2E budget in three separate probes
(probe_sharded_build_slice / probe_geometry_cg5 / probe_receipt_slice), each
on SYNTHETIC graphs (locality +-400 neighbor indices).  This probe runs the
whole per-chip pipeline in one process on ONE corpus, each stage consuming
the previous stage's real output:

  1M clustered corpus -> device locality order (core/lattice.py
  _jit_locality_order, the production path) ->
  [scan]    per-chip similarity slice: 125k query rows x 1M keys
            (ops/graph.py _topk_blocked_fast, bf16 MXU scan + approx_max_k
            + exact f32 rescore — parallel/sharded_build.py's per-chip
            program) ->
  [graph]   graph_from_topk at 1M (the replicated mutual/cap/normalize
            stage every chip runs) ->
  [settle]  fused windowed cg5 on the shard's REAL local graph (window plan
            built from the actual edges; out-of-shard edges are the halo,
            reported as halo_fraction — their contributions ride the
            overlapped all_to_all in parallel/halo_cg.py and cannot be
            timed on one chip) ->
  [receipt] full receipt slice (deltaH trace + per-node components +
            edge-sparse null points) on the same graph and settled state.

Each stage is slope-timed ((T_hi - T_lo)/(R_hi - R_lo), two passes averaged
— immune to the tunnel's RPC floor); a final single pass runs the four
stages back-to-back with ONE scalar fetch for an end-to-end wall.

Writes benchmarks/northstar_e2e_125k.json.
Run detached: nohup python benchmarks/probe_northstar_e2e.py > /tmp/nse2e.log 2>&1 &
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
        float(jax.device_get(fn(reps)))  # compile + warm
    ts = []
    for reps in (r1, r2, r1, r2):
        t0 = time.perf_counter()
        float(jax.device_get(fn(reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    return ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / (r2 - r1)


def main():
    from oscillink_tpu.core.lattice import _jit_locality_order
    from oscillink_tpu.models.coherence import EnergyParams
    from oscillink_tpu.ops.graph import (
        DEFAULT_BLOCK_ROWS,
        Graph,
        _topk_blocked_fast,
        graph_from_topk,
        normalize_rows,
    )
    from oscillink_tpu.ops.pallas import window_spmv as ws
    from oscillink_tpu.ops.receipts import (
        deltaH_trace,
        null_points_sparse,
        per_node_components,
    )

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((64, D)).astype(np.float32)
    assign = rng.integers(0, 64, size=N_FULL)
    Y = (centers[assign] + 0.35 * rng.standard_normal((N_FULL, D))).astype(
        np.float32
    )
    psi = (Y[:64].mean(0) / (np.linalg.norm(Y[:64].mean(0)) + 1e-12)).astype(
        np.float32
    )

    t0 = time.perf_counter()
    Yn = jax.jit(normalize_rows)(jnp.asarray(Y))
    order, _inv = _jit_locality_order(Yn)
    Yn = jax.block_until_ready(jnp.take(Yn, order, axis=0))
    order_ms = 1000.0 * (time.perf_counter() - t0)
    del Y
    print(f"# normalize + locality order (incl 3 GB h2d): {order_ms:.0f} ms",
          flush=True)

    # ---- stage 1: per-chip scan slice (slope) ---------------------------
    @functools.partial(jax.jit, static_argnums=(2,))
    def scan_slice(Yq, Yn, reps):
        def body(i, carry):
            acc, scale = carry
            vals, idx = _topk_blocked_fast(
                Yq * scale, Yn, K, DEFAULT_BLOCK_ROWS,
                recall_target=0.99, row_offset=0,
            )
            s = vals.sum()
            return acc + s + idx.sum(), 1.0 + 1e-12 * s

        return lax.fori_loop(0, reps, body, (jnp.float32(0.0), jnp.float32(1.0)))[0]

    Yq = Yn[:N_SLICE]
    scan_ms = slope(lambda r: scan_slice(Yq, Yn, r), 1, 3)
    print(f"# [scan] per-chip slice 125k x 1M: {scan_ms:.1f} ms", flush=True)

    # ---- stage 2: replicated graph stage at 1M (slope) ------------------
    topk = jax.jit(
        lambda Yq, Yn: _topk_blocked_fast(
            Yq, Yn, K, DEFAULT_BLOCK_ROWS, recall_target=0.99, row_offset=0
        )
    )
    vals, idx = jax.block_until_ready(topk(Yn, Yn))

    @functools.partial(jax.jit, static_argnums=(2,))
    def from_topk(vals, idx, reps):
        def body(i, carry):
            acc, scale = carry
            g = graph_from_topk(vals * scale, idx, row_cap=1.0)
            s = g.wn.sum()
            return acc + s + g.sqrt_deg.sum(), 1.0 + 1e-12 * s

        return lax.fori_loop(0, reps, body, (jnp.float32(0.0), jnp.float32(1.0)))[0]

    ftk_ms = slope(lambda r: from_topk(vals, idx, r), 1, 3)
    print(f"# [graph] graph_from_topk at 1M: {ftk_ms:.1f} ms", flush=True)

    # ---- shard-local graph: rows [0, 125k) of the REAL 1M graph ---------
    g_full = graph_from_topk(vals, idx, row_cap=1.0)
    idx_s, w_s, wn_s, sd_s = (
        np.asarray(a)
        for a in jax.device_get(
            [g_full.idx[:N_SLICE], g_full.w[:N_SLICE], g_full.wn[:N_SLICE],
             g_full.sqrt_deg[:N_SLICE]]
        )
    )
    in_shard = idx_s < N_SLICE
    valid = w_s > 0
    halo_fraction = float(
        ((~in_shard) & valid).sum() / max(valid.sum(), 1)
    )
    rows_self = np.broadcast_to(
        np.arange(N_SLICE, dtype=np.int32)[:, None], idx_s.shape
    )
    idx_local = np.where(in_shard, idx_s, rows_self).astype(np.int32)
    wn_local = np.where(in_shard, wn_s, 0.0).astype(np.float32)
    w_local = np.where(in_shard, w_s, 0.0).astype(np.float32)
    print(f"# shard slice: halo fraction {halo_fraction:.4f}", flush=True)

    # ---- stage 3: fused windowed cg5 on the real local graph (slope) ----
    t0 = time.perf_counter()
    plan, cov = ws.build_window_plan(idx_local, wn_local, W=W, R=R, n_windows=NWIN)
    s_max = ws.plan_s_max(plan)
    oh = ws.build_onehot(plan, W, s_max)
    plan_build_ms = 1000.0 * (time.perf_counter() - t0)
    print(f"# [settle] plan coverage={float(cov):.4f} s_max={s_max}", flush=True)

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

    @functools.partial(jax.jit, static_argnums=(4,))
    def chain_cg5(plan, oh, b, g, reps):
        def K_mul(x):
            return ws.k_matvec_windowed(plan, oh, x, g, W=W, R=R)

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

    cg5_ms = slope(lambda r: chain_cg5(plan, oh, rhs, gvec, r), 4, 24)
    print(f"# [settle] fused cg5 on real graph: {cg5_ms:.2f} ms", flush=True)

    # ---- stage 4: receipt slice on the real graph + settled state -------
    g_local = Graph(
        idx=jnp.asarray(idx_local),
        w=jnp.asarray(w_local),
        wn=jnp.asarray(wn_local),
        sqrt_deg=jnp.asarray(sd_s),
    )
    lam = EnergyParams.make(LAMG, LAMC, LAMQ)
    Yj = jnp.asarray(Y_slice)
    psi_j = jnp.asarray(psi)
    Bj = jnp.asarray(B)

    @functools.partial(jax.jit, static_argnums=(6,))
    def chain_receipt(g, U, Us, B, Y, psi, reps):
        def body(i, carry):
            acc, Us = carry
            dH = deltaH_trace(g, None, U, Us, lam, B)
            coh, anchor, query = per_node_components(g, Y, Us, lam, B, psi)
            nflag, nj, nz, nr = null_points_sparse(g, Us, lam.lamC, z_th=3.0)
            dig = (dH + jnp.sum(coh) + jnp.sum(anchor) + jnp.sum(query)
                   + jnp.sum(nz) + jnp.sum(nr) + jnp.sum(nflag))
            return (acc + dig, Us * 0.9995)

        return lax.fori_loop(0, reps, body, (jnp.float32(0.0), Us))[0]

    # the settled state: one real cg5 solve output, unpadded
    def one_solve(plan, oh, b, g):
        def K_mul(x):
            return ws.k_matvec_windowed(plan, oh, x, g, W=W, R=R)

        x = b
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

        x, _, _, _ = lax.fori_loop(0, 5, body, (x, r, p, rz))
        return x

    U_settled = jax.jit(one_solve)(plan, oh, rhs, gvec)[:N_SLICE]
    rcpt_ms = slope(
        lambda r: chain_receipt(g_local, Yj, U_settled, Bj, Yj, psi_j, r), 4, 24
    )
    print(f"# [receipt] full slice on real graph: {rcpt_ms:.2f} ms", flush=True)

    # ---- one back-to-back pass, single fetch -----------------------------
    t0 = time.perf_counter()
    v2, i2 = topk(Yn, Yn)
    g2 = graph_from_topk(v2, i2, row_cap=1.0)
    U2 = jax.jit(one_solve)(plan, oh, rhs, gvec)[:N_SLICE]
    dig = jax.jit(
        lambda g, U, Us, B, Y, psi: chain_receipt(g, U, Us, B, Y, psi, 1)
    )
    float(jax.device_get(
        dig(g_local, Yj, U2, Bj, Yj, psi_j) + g2.wn.sum()
    ))
    onepass_ms = 1000.0 * (time.perf_counter() - t0)
    print(f"# one-pass wall (full-scan + graph + settle + receipt, one fetch): "
          f"{onepass_ms:.0f} ms", flush=True)

    per_chip = scan_ms + ftk_ms + cg5_ms + rcpt_ms
    out = {
        "config": f"1M/8 per-chip slice: {N_SLICE} rows x {N_FULL} keys, "
                  f"D={D}, k={K}, W={W} R={R} n_windows={NWIN}",
        "device": str(jax.devices()[0].device_kind),
        "pipeline": "one process; every stage consumes the previous stage's "
                    "real output (no synthetic graphs)",
        "scan_slice_ms": round(scan_ms, 1),
        "graph_from_topk_1m_ms": round(ftk_ms, 1),
        "settle_fused_cg5_ms": round(cg5_ms, 2),
        "receipt_full_slice_ms": round(rcpt_ms, 2),
        "per_chip_e2e_ms": round(per_chip, 1),
        "plan_coverage": round(float(cov), 4),
        "plan_build_ms": round(plan_build_ms, 1),
        "halo_fraction": round(halo_fraction, 4),
        "one_pass_wall_ms": round(onepass_ms, 1),
        "one_pass_note": "single back-to-back pass with ONE scalar fetch; "
                         "uses the FULL 1M scan (8x the per-chip slice) so "
                         "it upper-bounds the per-chip wall",
        "not_measured_on_one_chip": "halo all_to_all application "
                                    "(halo_fraction above bounds its "
                                    "volume) and the build's one-time "
                                    "2.7 GB/chip ICI all_gather",
        "method": "slope per stage (scan/graph: (T3-T1)/2; settle/receipt: "
                  "(T24-T4)/20), two passes averaged",
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "northstar_e2e_125k.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
