"""Halo-exchange sharded CG: all_to_all of just the boundary rows.

The production multi-chip solver for REORDERED lattices (parallel/reorder.py):
after PCA-bisection ordering, clustered corpora need only ~2% of the rows an
all-gather moves (measured, benchmarks/scale_tpu.json).  Host-side
precomputation builds, per shard pair (s -> d), the padded list of s-rows
that d's gathers touch; each CG iteration then

  1. gathers each shard's outgoing boundary rows into a [n_dev, R_max, D]
     send buffer,
  2. swaps buffers with ONE `lax.all_to_all` over the `rows` axis (rides
     ICI),
  3. runs the local gather-SpMV against [local rows ++ received halo] using
     a precomputed remapped index table,
  4. psum's the CG dot products as usual.

Per-iteration communication: n_dev * R_max * D versus N * D for the
all-gather path — R_max is the worst shard-pair request count, so the win
tracks the measured halo fraction.  Falls back to `shardmap_cg` semantics
when the halo is large (R_max close to rows_per).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.coherence import EnergyParams
from ..ops.graph import Graph

__all__ = [
    "HaloPlan",
    "build_halo_plan",
    "build_shard_window_plans",
    "halo_solve",
    "halo_solve_windowed",
    "solve_auto",
]


class HaloPlan(NamedTuple):
    """Host-precomputed exchange plan for a row-sharded graph.

    send_map: [n_dev, n_dev, R_max] int32 — for source shard s, the LOCAL row
              ids s sends to destination d (slot [s, d]; padded with 0).
    send_valid: same shape, bool padding mask.
    remap:    [N, K] int32 — neighbor indices rewritten into each owning
              shard's extended frame: local rows keep [0, rows_per); halo
              references point at rows_per + d_src * R_max + slot.
    The matvec uses the LOCAL/HALO split of remap so the local accumulation
    carries no data dependency on the collective (XLA's latency-hiding
    scheduler overlaps the all_to_all with it):
    idx_local/w_local: [N, K] — local-frame gather (0-weight on halo edges).
    idx_halo/w_halo:   [N, K] — halo-frame gather (0-weight on local edges).
    r_max:    int — padded per-pair request count.
    rows_per: int
    """

    send_map: np.ndarray
    send_valid: np.ndarray
    remap: np.ndarray
    idx_local: np.ndarray
    w_local_mask: np.ndarray
    idx_halo: np.ndarray
    w_halo_mask: np.ndarray
    r_max: int
    rows_per: int


def build_halo_plan(idx: np.ndarray, w: np.ndarray, n_dev: int) -> HaloPlan:
    """Precompute the exchange plan from a padded [N, K] neighbor structure.

    Fully vectorized NumPy (sort/unique/segment arithmetic) — no per-edge
    Python loops, so the 1M x 8 regime plans in seconds (VERDICT r1 flagged
    the previous triple-nested version as the scaling blocker)."""
    n, k = idx.shape
    if n % n_dev != 0:
        raise ValueError(f"N={n} must divide n_dev={n_dev}")
    rows_per = n // n_dev
    idx32 = np.ascontiguousarray(idx, dtype=np.int32)
    shard_of = idx32 // rows_per  # [N, K] owning shard per neighbor
    dst_of_row = (np.arange(n, dtype=np.int32) // rows_per)[:, None]  # [N, 1]

    live = w > 0
    halo_edge = live & (shard_of != dst_of_row)

    # unique (dst, j) halo requests, sorted by (dst, j) — within a dst the
    # source shard (j // rows_per) is therefore non-decreasing, making
    # (dst, src) groups contiguous segments
    halo_rows, halo_cols = np.nonzero(halo_edge)
    keys = (halo_rows // rows_per).astype(np.int64) * n + idx32[
        halo_rows, halo_cols
    ].astype(np.int64)
    u = np.unique(keys)  # sorted unique (dst*n + j)
    dst_u = u // n
    j_u = u % n
    src_u = j_u // rows_per

    gid = dst_u * n_dev + src_u  # contiguous segments in u-order
    if len(u):
        seg_start = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        counts = np.diff(np.r_[seg_start, len(u)])
        r_max = int(counts.max())
        # slot of each entry within its (dst, src) segment
        slots = np.arange(len(u)) - np.repeat(seg_start, counts)
    else:
        r_max = 1
        slots = np.zeros(0, dtype=np.int64)

    send_map = np.zeros((n_dev, n_dev, r_max), dtype=np.int32)
    send_valid = np.zeros((n_dev, n_dev, r_max), dtype=bool)
    send_map[src_u, dst_u, slots] = (j_u - src_u * rows_per).astype(np.int32)
    send_valid[src_u, dst_u, slots] = True

    # remap every edge into its owning shard's extended frame
    local_edge = live & ~halo_edge
    remap = np.where(local_edge, idx32 - dst_of_row * rows_per, 0).astype(np.int32)
    if len(u):
        # halo frame position = src * r_max + slot, found via sorted lookup
        pos = np.searchsorted(u, keys)
        halo_frame = (src_u[pos] * r_max + slots[pos]).astype(np.int32)
        remap[halo_rows, halo_cols] = rows_per + halo_frame

    is_halo = remap >= rows_per
    idx_local = np.where(is_halo, 0, remap).astype(np.int32)
    w_local_mask = (~is_halo).astype(np.float32)
    idx_halo = np.where(is_halo, remap - rows_per, 0).astype(np.int32)
    w_halo_mask = is_halo.astype(np.float32)
    return HaloPlan(
        send_map, send_valid, remap, idx_local, w_local_mask, idx_halo,
        w_halo_mask, r_max, rows_per,
    )


def halo_solve(
    mesh: Mesh,
    g: Graph,
    plan: HaloPlan,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    tol: float = 1e-4,
    max_iters: int = 64,
    axis_name: str = "rows",
    gather_dtype: str = "float32",
):
    """Stationary solve with halo-exchange collectives. Same numerical
    contract as shardmap_cg (epsilons, >=1 iteration, max-col-norm).

    ``gather_dtype="bfloat16"`` reads neighbor rows from a bf16 view of the
    CG vector (f32 accumulation).  The gather is latency-bound, so this
    buys a measured 1.16x per apply at the 125k-row shard size — combined
    with the measured 4-iteration convergence it moves the isotropic-data
    fallback under the 100 ms/1M budget (benchmarks/gather_bf16_125k.json:
    solution relative error 4.2e-5, deltaH delta 0 at 5 iters)."""
    n = Y.shape[0]
    n_dev = mesh.devices.size
    if n_dev * plan.rows_per != n:
        raise ValueError("plan does not match mesh/N")

    row = NamedSharding(mesh, P(axis_name, None))
    vec = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    Y = jax.device_put(Y, row)
    B = jax.device_put(B, vec)
    psi = jax.device_put(psi, repl)
    wn = jax.device_put(g.wn, row)
    idx_local = jax.device_put(jnp.asarray(plan.idx_local), row)
    w_local_mask = jax.device_put(jnp.asarray(plan.w_local_mask), row)
    idx_halo = jax.device_put(jnp.asarray(plan.idx_halo), row)
    w_halo_mask = jax.device_put(jnp.asarray(plan.w_halo_mask), row)
    # shard the send plan by SOURCE shard (leading axis)
    send_map = jax.device_put(jnp.asarray(plan.send_map), NamedSharding(mesh, P(axis_name, None, None)))
    send_valid = jax.device_put(
        jnp.asarray(plan.send_valid), NamedSharding(mesh, P(axis_name, None, None))
    )

    tol_a = jnp.float32(tol)
    max_iters_a = jnp.int32(max_iters)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(axis_name, None),  # Y
            P(axis_name),  # B
            P(),  # psi
            P(axis_name, None),  # wn
            P(axis_name, None),  # idx_local
            P(axis_name, None),  # w_local_mask
            P(axis_name, None),  # idx_halo
            P(axis_name, None),  # w_halo_mask
            P(axis_name, None, None),  # send_map  [1, n_dev, R]
            P(axis_name, None, None),  # send_valid
        ),
        out_specs=(P(axis_name, None), P(), P()),
    )
    def solve(Y_l, B_l, psi_r, wn_l, il_l, wl_l, ih_l, wh_l, smap_l, svalid_l):
        smap = smap_l[0]  # [n_dev, R]
        svalid = svalid_l[0]
        k = wn_l.shape[1]

        def halo_of(X_l):
            # stage outgoing boundary rows per destination + ONE all_to_all;
            # slot s of `recv` holds what shard s sent us
            send = jnp.take(X_l, smap.reshape(-1), axis=0).reshape(
                smap.shape[0], smap.shape[1], X_l.shape[1]
            )
            send = jnp.where(svalid[:, :, None], send, 0.0)
            recv = lax.all_to_all(
                send, axis_name, split_axis=0, concat_axis=0, tiled=False
            )
            return recv.reshape(-1, X_l.shape[1])  # [n_dev * R, D]

        bf16 = gather_dtype in ("bfloat16", "bf16")

        def M_mul(p_l):
            halo = halo_of(p_l)
            # interior accumulation carries NO dependency on the collective —
            # XLA overlaps the all_to_all with these gathers
            src = p_l.astype(jnp.bfloat16) if bf16 else p_l
            halo_src = halo.astype(jnp.bfloat16) if bf16 else halo
            acc = p_l
            for a in range(k):
                wa = (wn_l[:, a] * wl_l[:, a])[:, None]
                acc = acc - wa * jnp.take(src, il_l[:, a], axis=0).astype(
                    jnp.float32
                )
            for a in range(k):
                wa = (wn_l[:, a] * wh_l[:, a])[:, None]
                acc = acc - wa * jnp.take(halo_src, ih_l[:, a], axis=0).astype(
                    jnp.float32
                )
            return lam.lamG * p_l + lam.lamC * acc + lam.lamQ * (B_l[:, None] * p_l)

        rhs = lam.lamG * Y_l + lam.lamQ * (B_l[:, None] * psi_r[None, :])
        inv_M = 1.0 / ((lam.lamG + lam.lamQ * B_l)[:, None] + 1e-12)

        x = Y_l
        r = rhs - M_mul(x)
        z = r * inv_M
        p = z
        rz = lax.psum(jnp.sum(r * z, axis=0), axis_name)

        def cond(c):
            _, _, _, _, it, res = c
            return (it == 0) | ((it < max_iters_a) & (res > tol_a))

        def body(c):
            x, r, p, rz, it, _ = c
            Ap = M_mul(p)
            denom = lax.psum(jnp.sum(p * Ap, axis=0), axis_name) + 1e-18
            alpha = rz / denom
            x = x + p * alpha
            r = r - Ap * alpha
            res = jnp.sqrt(jnp.max(lax.psum(jnp.sum(r * r, axis=0), axis_name)))
            z = r * inv_M
            rz_new = lax.psum(jnp.sum(r * z, axis=0), axis_name)
            p = z + p * (rz_new / (rz + 1e-18))
            return (x, r, p, rz_new, it + 1, res)

        x, _, _, _, it, res = lax.while_loop(
            cond, body, (x, r, p, rz, jnp.int32(0), jnp.float32(jnp.inf))
        )
        return x, it, res

    return jax.jit(solve)(
        Y, B, psi, wn, idx_local, w_local_mask, idx_halo, w_halo_mask,
        send_map, send_valid,
    )


def build_shard_window_plans(plan: HaloPlan, wn: np.ndarray, n_dev: int):
    """Per-shard window plans over each shard's LOCAL frame.

    Local edges (w_local_mask) route through the windowed Pallas matvec
    inside the shard_map; halo edges stay on the gather path (the halo
    frame is small by construction).  Shapes are made uniform across shards
    (shared straggler-array length and s_max) so the stacked plan arrays
    shard over the mesh's leading axis.  Returns
    (stacked_plan_fields, stacked_onehot_fields, min_coverage, s_max).
    """
    from ..ops.pallas.window_spmv import (
        build_onehot,
        build_window_plan,
        plan_s_max,
    )

    rows_per = plan.rows_per
    wn = np.asarray(wn, dtype=np.float32)
    plans, covs = [], []
    for s in range(n_dev):
        sl = slice(s * rows_per, (s + 1) * rows_per)
        wn_local = wn[sl] * plan.w_local_mask[sl]
        # three 384-row windows with the row block ALIGNED to the window
        # (R = W): measured-best geometry at the 125k shard — 5.21 vs
        # 6.60 ms/apply at R=256 (benchmarks/window_geometry_125k.json)
        p_s, cov_s = build_window_plan(
            plan.idx_local[sl], wn_local, W=384, R=384, n_windows=3
        )
        plans.append(p_s)
        covs.append(cov_s)
    s_max = max(plan_s_max(p) for p in plans)
    # the kernel DMAs [strag_off[b-1], strag_off[b-1] + s_max) with the
    # SHARED s_max; each shard's own tail slack only covers its OWN
    # plan_s_max, so pad every shard to the worst-case end-of-DMA bound —
    # otherwise a shard with small per-block segments but a large offset
    # tail reads past its contribution buffer in the Pallas async copy
    s_len = max(
        max(int(np.asarray(p.strag_off)[-1]) + s_max for p in plans),
        max(p.strag_w.shape[0] for p in plans),
    )

    def pad_strag(p):
        cur = p.strag_w.shape[0]
        if cur == s_len:
            return p
        n_pad_rows = p.n_pad
        ext = s_len - cur
        return p._replace(
            strag_dst=jnp.concatenate(
                [p.strag_dst, jnp.full(ext, n_pad_rows - 1, jnp.int32)]
            ),
            strag_src=jnp.concatenate([p.strag_src, jnp.zeros(ext, jnp.int32)]),
            strag_w=jnp.concatenate([p.strag_w, jnp.zeros(ext, jnp.float32)]),
        )

    plans = [pad_strag(p) for p in plans]
    ohs = [build_onehot(p, 384, s_max) for p in plans]
    from ..ops.pallas.window_spmv import _env_precision

    if _env_precision() in ("oh16", "dma16"):
        # bf16-stored one-hot on the per-shard kernels too (same trade as
        # the single-chip lattice ctx: halves the main one-hot stream)
        ohs = [o._replace(main=o.main.astype(jnp.bfloat16)) for o in ohs]
    stacked_plan = jax.tree.map(lambda *xs: jnp.stack(xs), *plans)
    stacked_oh = jax.tree.map(lambda *xs: jnp.stack(xs), *ohs)
    return stacked_plan, stacked_oh, float(min(covs)), s_max


def halo_solve_windowed(
    mesh: Mesh,
    g: Graph,
    plan: HaloPlan,
    wplan,
    woh,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    tol: float = 1e-4,
    max_iters: int = 64,
    axis_name: str = "rows",
):
    """Halo-exchange CG with the per-shard LOCAL matvec on the windowed
    Pallas kernel (`ops.pallas.window_spmv`) — the per-chip compute path of
    the 1M-on-v5e-8 target.  Halo edges keep the gather path; the
    all_to_all still overlaps the local accumulation.  Same numerical
    contract as `halo_solve` up to the kernel's ~1e-6 matmul rounding."""
    from ..ops.pallas.window_spmv import lap_matvec_windowed, pad_rows

    n = Y.shape[0]
    n_dev = mesh.devices.size
    if n_dev * plan.rows_per != n:
        raise ValueError("plan does not match mesh/N")
    rows_per = plan.rows_per

    row = NamedSharding(mesh, P(axis_name, None))
    vec = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    lead = lambda nd: NamedSharding(mesh, P(axis_name, *([None] * nd)))  # noqa: E731

    Y = jax.device_put(Y, row)
    B = jax.device_put(B, vec)
    psi = jax.device_put(psi, repl)
    wn = jax.device_put(g.wn, row)
    idx_halo = jax.device_put(jnp.asarray(plan.idx_halo), row)
    w_halo_mask = jax.device_put(jnp.asarray(plan.w_halo_mask), row)
    send_map = jax.device_put(jnp.asarray(plan.send_map), lead(2))
    send_valid = jax.device_put(jnp.asarray(plan.send_valid), lead(2))
    wplan = jax.tree.map(lambda x: jax.device_put(x, lead(x.ndim - 1)), wplan)
    woh = jax.tree.map(lambda x: jax.device_put(x, lead(x.ndim - 1)), woh)

    tol_a = jnp.float32(tol)
    max_iters_a = jnp.int32(max_iters)
    spec_of = lambda x: P(axis_name, *([None] * (x.ndim - 1)))  # noqa: E731

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(axis_name, None),  # Y
            P(axis_name),  # B
            P(),  # psi
            P(axis_name, None),  # wn
            P(axis_name, None),  # idx_halo
            P(axis_name, None),  # w_halo_mask
            P(axis_name, None, None),  # send_map
            P(axis_name, None, None),  # send_valid
            jax.tree.map(spec_of, wplan),
            jax.tree.map(spec_of, woh),
        ),
        out_specs=(P(axis_name, None), P(), P()),
        # the pallas_call inside the body does not annotate varying-mesh-axes
        # metadata on its out_shape; skip the vma check
        check_vma=False,
    )
    def solve(Y_l, B_l, psi_r, wn_l, ih_l, wh_l, smap_l, svalid_l, wp_l, oh_l):
        smap = smap_l[0]
        svalid = svalid_l[0]
        k = wn_l.shape[1]
        wp = jax.tree.map(lambda x: x[0], wp_l)
        oh = jax.tree.map(lambda x: x[0], oh_l)
        n_pad_rows = wp.n_pad

        def halo_of(X_l):
            send = jnp.take(X_l, smap.reshape(-1), axis=0).reshape(
                smap.shape[0], smap.shape[1], X_l.shape[1]
            )
            send = jnp.where(svalid[:, :, None], send, 0.0)
            recv = lax.all_to_all(
                send, axis_name, split_axis=0, concat_axis=0, tiled=False
            )
            return recv.reshape(-1, X_l.shape[1])

        def M_mul(p_l):
            halo = halo_of(p_l)
            # local edges: windowed Pallas matvec returns p - Wn_local p
            acc = lap_matvec_windowed(wp, oh, pad_rows(p_l, n_pad_rows))[
                :rows_per
            ]
            # halo edges: gather against the received frame (small)
            for a in range(k):
                wa = (wn_l[:, a] * wh_l[:, a])[:, None]
                acc = acc - wa * jnp.take(halo, ih_l[:, a], axis=0)
            return lam.lamG * p_l + lam.lamC * acc + lam.lamQ * (B_l[:, None] * p_l)

        rhs = lam.lamG * Y_l + lam.lamQ * (B_l[:, None] * psi_r[None, :])
        inv_M = 1.0 / ((lam.lamG + lam.lamQ * B_l)[:, None] + 1e-12)

        x = Y_l
        r = rhs - M_mul(x)
        z = r * inv_M
        p = z
        rz = lax.psum(jnp.sum(r * z, axis=0), axis_name)

        def cond(c):
            _, _, _, _, it, res = c
            return (it == 0) | ((it < max_iters_a) & (res > tol_a))

        def body(c):
            x, r, p, rz, it, _ = c
            Ap = M_mul(p)
            denom = lax.psum(jnp.sum(p * Ap, axis=0), axis_name) + 1e-18
            alpha = rz / denom
            x = x + p * alpha
            r = r - Ap * alpha
            res = jnp.sqrt(jnp.max(lax.psum(jnp.sum(r * r, axis=0), axis_name)))
            z = r * inv_M
            rz_new = lax.psum(jnp.sum(r * z, axis=0), axis_name)
            p = z + p * (rz_new / (rz + 1e-18))
            return (x, r, p, rz_new, it + 1, res)

        x, _, _, _, it, res = lax.while_loop(
            cond, body, (x, r, p, rz, jnp.int32(0), jnp.float32(jnp.inf))
        )
        return x, it, res

    return jax.jit(solve)(
        Y, B, psi, wn, idx_halo, w_halo_mask, send_map, send_valid, wplan, woh
    )


def solve_auto(
    mesh: Mesh,
    Y: np.ndarray,
    psi: np.ndarray,
    B: np.ndarray | None = None,
    *,
    k: int = 8,
    lamG: float = 1.0,
    lamC: float = 0.5,
    lamQ: float = 4.0,
    tol: float = 1e-4,
    max_iters: int = 64,
    halo_fraction_cutoff: float = 0.5,
    reorder_levels: int = 4,
    similarity: str = "auto",
):
    """Tier-selecting sharded stationary solve.

    Reorders rows by PCA bisection, builds the graph, measures the halo
    (`reorder.halo_stats`), and picks halo-exchange when the mean halo is
    below ``halo_fraction_cutoff`` of the all-gather volume — otherwise the
    all_gather shard_map path.  Returns (Ustar in ORIGINAL row order, info
    dict with the decision and stats).
    """
    from .reorder import apply_order, halo_stats, pca_bisection_order
    from .shardmap_cg import shardmap_solve

    Y = np.asarray(Y, dtype=np.float32)
    n = Y.shape[0]
    n_dev = mesh.devices.size
    if B is None:
        B = np.ones(n, dtype=np.float32)
    order = pca_bisection_order(Y, levels=reorder_levels)
    Y_s, B_s, inv = apply_order(order, Y, np.asarray(B, dtype=np.float32))

    # sharded graph build: each device top-k's its own rows against the
    # all-gathered anchors (n_dev-way parallel similarity scan) — the
    # round-1 single-device build was the 1M-regime blocker (VERDICT r1)
    from .sharded_build import build_graph_sharded

    g = build_graph_sharded(mesh, Y_s, k, similarity=similarity)
    Yd = jnp.asarray(Y_s)
    idx_h, w_h = (np.asarray(a) for a in jax.device_get([g.idx, g.w]))
    stats = halo_stats(idx_h, w_h, n_dev)

    lam = EnergyParams.make(lamG, lamC, lamQ, 0.0)
    psi_d = jnp.asarray(np.asarray(psi, dtype=np.float32))
    B_d = jnp.asarray(B_s)
    use_halo = (
        stats["halo_mean"] < halo_fraction_cutoff * stats["allgather_rows"]
    )
    win_cov = None
    if use_halo:
        plan = build_halo_plan(idx_h, w_h, n_dev)
        # windowed local matvec inside the halo tier: the per-chip compute
        # path of the 1M target.  Selected when every shard's local-frame
        # plan sustains the coverage bar (same env knob as the single-chip
        # path); falls back to the gather local matvec otherwise.
        try:
            min_cov_env = float(
                os.getenv("OSCILLINK_WINDOWED_MIN_COVERAGE", "0.92")
            )
        except ValueError:
            min_cov_env = 0.92
        windowed_mode = (
            os.getenv("OSCILLINK_WINDOWED_MATVEC", "auto").strip().lower()
        )
        wargs = None
        if windowed_mode not in {"0", "off", "false", "no"} and plan.rows_per >= 1024:
            from ..ops.pallas.window_spmv import (
                accept_window_plan,
                lowcov_smax_bound,
            )

            wn_h = np.asarray(jax.device_get(g.wn))
            wplan, woh, win_cov, win_smax = build_shard_window_plans(
                plan, wn_h, n_dev
            )
            forced = windowed_mode in {"1", "force", "on", "true"}
            # the host builder computes s_max exactly (no fits/cap concept),
            # so acceptance is coverage OR the round-5 bounded-straggler
            # rule: the kernel's cost scales with the straggler DMA window,
            # not coverage (real 1M clustered shard: cov 0.067 at s_max 512
            # still beats the gather — northstar_e2e_125k.json)
            ok, _reason = accept_window_plan(
                win_cov, 0, True, win_smax, float("inf"),
                forced=forced, min_cov=min_cov_env,
                lowcov_bound=lowcov_smax_bound(),
            )
            if ok:
                wargs = (wplan, woh)
        if wargs is not None:
            U, it, res = halo_solve_windowed(
                mesh, g, plan, wargs[0], wargs[1], Yd, psi_d, B_d, lam,
                tol=tol, max_iters=max_iters,
            )
            tier = "halo-exchange-windowed"
        else:
            gd = os.getenv("OSCILLINK_GATHER_DTYPE", "float32").strip().lower()
            U, it, res = halo_solve(
                mesh, g, plan, Yd, psi_d, B_d, lam, tol=tol,
                max_iters=max_iters, gather_dtype=gd,
            )
            tier = (
                "halo-exchange-bf16gather"
                if gd in ("bfloat16", "bf16")
                else "halo-exchange"
            )
    else:
        U, it, res = shardmap_solve(
            mesh, g, Yd, psi_d, B_d, lam, tol=tol, max_iters=max_iters
        )
        tier = "all-gather"
    U_orig = np.asarray(U)[inv]
    return U_orig, {
        "tier": tier,
        "halo_stats": stats,
        "window_coverage": win_cov,
        "iters": int(jax.device_get(it)),
        "res": float(jax.device_get(res)),
    }
