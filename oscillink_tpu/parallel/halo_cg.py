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

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.coherence import EnergyParams
from ..ops.graph import Graph

__all__ = ["HaloPlan", "build_halo_plan", "halo_solve", "solve_auto"]


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
    """Precompute the exchange plan from a padded [N, K] neighbor structure."""
    n, k = idx.shape
    if n % n_dev != 0:
        raise ValueError(f"N={n} must divide n_dev={n_dev}")
    rows_per = n // n_dev
    shard_of = idx // rows_per  # [N, K] owning shard per neighbor

    # per (src, dst): unique global rows src must send to dst
    requests: list[list[np.ndarray]] = []
    r_max = 1
    for src in range(n_dev):
        row_lists = []
        for dst in range(n_dev):
            if src == dst:
                row_lists.append(np.zeros(0, dtype=np.int64))
                continue
            lo, hi = dst * rows_per, (dst + 1) * rows_per
            block_idx = idx[lo:hi]
            block_w = w[lo:hi]
            mask = (block_w > 0) & (shard_of[lo:hi] == src)
            needed = np.unique(block_idx[mask])
            row_lists.append(needed.astype(np.int64))
            r_max = max(r_max, len(needed))
        requests.append(row_lists)

    send_map = np.zeros((n_dev, n_dev, r_max), dtype=np.int32)
    send_valid = np.zeros((n_dev, n_dev, r_max), dtype=bool)
    # halo position lookup per dst: global row -> slot in dst's halo frame
    halo_pos: list[dict[int, int]] = [dict() for _ in range(n_dev)]
    for src in range(n_dev):
        for dst in range(n_dev):
            rows = requests[src][dst]
            send_map[src, dst, : len(rows)] = (rows - src * rows_per).astype(np.int32)
            send_valid[src, dst, : len(rows)] = True
            for slot, g_row in enumerate(rows):
                halo_pos[dst][int(g_row)] = src * r_max + slot

    remap = np.zeros_like(idx, dtype=np.int32)
    for dst in range(n_dev):
        lo, hi = dst * rows_per, (dst + 1) * rows_per
        for r in range(lo, hi):
            for a in range(k):
                j = int(idx[r, a])
                if w[r, a] <= 0:
                    remap[r, a] = 0  # padding edge: any valid local slot
                elif lo <= j < hi:
                    remap[r, a] = j - lo
                else:
                    remap[r, a] = rows_per + halo_pos[dst][j]

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
):
    """Stationary solve with halo-exchange collectives. Same numerical
    contract as shardmap_cg (epsilons, >=1 iteration, max-col-norm)."""
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

        def M_mul(p_l):
            halo = halo_of(p_l)
            # interior accumulation carries NO dependency on the collective —
            # XLA overlaps the all_to_all with these gathers
            acc = p_l
            for a in range(k):
                wa = (wn_l[:, a] * wl_l[:, a])[:, None]
                acc = acc - wa * jnp.take(p_l, il_l[:, a], axis=0)
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
        Y, B, psi, wn, idx_local, w_local_mask, idx_halo, w_halo_mask,
        send_map, send_valid,
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
):
    """Tier-selecting sharded stationary solve.

    Reorders rows by PCA bisection, builds the graph, measures the halo
    (`reorder.halo_stats`), and picks halo-exchange when the mean halo is
    below ``halo_fraction_cutoff`` of the all-gather volume — otherwise the
    all_gather shard_map path.  Returns (Ustar in ORIGINAL row order, info
    dict with the decision and stats).
    """
    from ..ops.graph import build_graph
    from .reorder import apply_order, halo_stats, pca_bisection_order
    from .shardmap_cg import shardmap_solve

    Y = np.asarray(Y, dtype=np.float32)
    n = Y.shape[0]
    n_dev = mesh.devices.size
    if B is None:
        B = np.ones(n, dtype=np.float32)
    order = pca_bisection_order(Y, levels=reorder_levels)
    Y_s, B_s, inv = apply_order(order, Y, np.asarray(B, dtype=np.float32))

    Yd = jnp.asarray(Y_s)
    g = jax.jit(lambda Y: build_graph(Y, k))(Yd)
    idx_h, w_h = np.asarray(g.idx), np.asarray(g.w)
    stats = halo_stats(idx_h, w_h, n_dev)

    lam = EnergyParams.make(lamG, lamC, lamQ, 0.0)
    psi_d = jnp.asarray(np.asarray(psi, dtype=np.float32))
    B_d = jnp.asarray(B_s)
    use_halo = (
        stats["halo_mean"] < halo_fraction_cutoff * stats["allgather_rows"]
    )
    if use_halo:
        plan = build_halo_plan(idx_h, w_h, n_dev)
        U, it, res = halo_solve(
            mesh, g, plan, Yd, psi_d, B_d, lam, tol=tol, max_iters=max_iters
        )
        tier = "halo-exchange"
    else:
        U, it, res = shardmap_solve(
            mesh, g, Yd, psi_d, B_d, lam, tol=tol, max_iters=max_iters
        )
        tier = "all-gather"
    U_orig = np.asarray(U)[inv]
    return U_orig, {
        "tier": tier,
        "halo_stats": stats,
        "iters": int(jax.device_get(it)),
        "res": float(jax.device_get(res)),
    }
