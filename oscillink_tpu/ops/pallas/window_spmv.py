"""Windowed block-sparse Laplacian matvec: contiguous DMA + one-hot MXU.

The hot op of every CG iteration is the k-sparse normalized-Laplacian matvec
(reference analog: the dense ``L_sym @ X`` in oscillink/core/lattice.py:177).
The padded-row XLA formulation (`ops.graph.lap_matvec`) is bound by the TPU
gather engine, which we measured at ~200 GB/s *independent of index pattern*
(sequential == random == local; benchmarks/probe_gather.py) — ~4x under the
HBM streaming rate.  This kernel sidesteps the gather engine entirely:

  * rows are processed in blocks of R; for each row block the plan picks the
    two W-aligned row *windows* of X that contain most of its neighbor ids
    (after locality ordering, mutual-kNN neighbors concentrate near the
    diagonal — parallel/reorder.py gives the ordering);
  * the within-window selection is a [R, 2W] one-hot *weight* matrix.  It is
    constant across CG iterations, so it is built ONCE per solve by
    `build_onehot` (vectorized XLA compare, no scatter) and streamed per
    iteration — measured ~2.5 ms/apply cheaper than rebuilding on the VPU
    inside the kernel;
  * per grid step the kernel pulls both windows and the one-hot block into
    VMEM with contiguous block-spec DMAs (pipelined by Pallas) and runs two
    MXU matmuls: out = X_blk - OH[:, :W] @ win1 - OH[:, W:] @ win2;
  * edges outside both windows ("stragglers") are corrected afterwards with
    one XLA gather + scatter-add over a compacted COO list.

For clustered/ordered data the straggler fraction is a few percent and the
matvec runs at streaming rate + MXU (measured ~3x the XLA gather path at
N=100k, D=768, k=8); for adversarially random graphs the plan reports low
coverage and callers keep the XLA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "WindowPlan",
    "build_window_plan",
    "build_onehot",
    "lap_matvec_windowed",
    "pad_rows",
]

DEFAULT_W = 512  # window rows (must be a multiple of R)
DEFAULT_R = 256  # output row-block rows
_LANE = 8


class WindowPlan(NamedTuple):
    """Device-resident window plan (a pytree of arrays only; the static
    W/R geometry is passed separately so jit treats it as compile-time)."""

    c1: jax.Array  # [B] int32 — first window id (units of W rows)
    c2: jax.Array  # [B] int32 — second window id
    idx1l: jax.Array  # [Npad, K] int32 — window-1 local col ids (0 where unused)
    wn1: jax.Array  # [Npad, K] f32 — window-1 edge weights (0 where unused)
    idx2l: jax.Array  # [Npad, K] int32
    wn2: jax.Array  # [Npad, K] f32
    strag_dst: jax.Array  # [S] int32 — straggler destination rows (sorted)
    strag_src: jax.Array  # [S] int32 — straggler source rows
    strag_w: jax.Array  # [S] f32 — straggler weights (0 on padding)

    @property
    def n_pad(self) -> int:
        return self.idx1l.shape[0]

    @property
    def n_blocks(self) -> int:
        return self.c1.shape[0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_window_plan(
    idx: np.ndarray,
    wn: np.ndarray,
    *,
    W: int = DEFAULT_W,
    R: int = DEFAULT_R,
) -> tuple[WindowPlan, float]:
    """Build the window plan on host. Returns (plan, coverage in [0, 1]).

    ``idx``/``wn`` are the padded [N, K] neighbor arrays of `ops.graph.Graph`
    (wn == 0 marks padding). Vectorized NumPy throughout — no per-edge Python
    loops (VERDICT r1: build_halo_plan's Python loops were the anti-pattern).
    """
    if W % R != 0:
        raise ValueError(f"W={W} must be a multiple of R={R}")
    idx = np.asarray(idx)
    wn = np.asarray(wn)
    n, k = idx.shape
    n_pad = _round_up(n, W)
    b = n_pad // R

    idx_p = np.zeros((n_pad, k), dtype=np.int32)
    wn_p = np.zeros((n_pad, k), dtype=np.float32)
    idx_p[:n] = idx
    wn_p[:n] = wn

    live = wn_p != 0.0
    wblk = idx_p // W  # [Npad, K] window id of each edge
    rowblk = (np.arange(n_pad) // R)[:, None]  # [Npad, 1]

    # histogram of live edges per (row block, window)
    n_win = n_pad // W
    hist = np.zeros((b, n_win), dtype=np.int64)
    np.add.at(hist, (np.broadcast_to(rowblk, wblk.shape)[live], wblk[live]), 1)

    c1 = np.argmax(hist, axis=1).astype(np.int32)
    hist2 = hist.copy()
    hist2[np.arange(b), c1] = -1
    c2 = np.argmax(hist2, axis=1).astype(np.int32)
    # degenerate single-window blocks: point c2 somewhere distinct
    same = c2 == c1
    c2[same] = (c1[same] + 1) % max(n_win, 1)

    c1_e = c1[rowblk[:, 0]][:, None]  # [Npad, 1] broadcast to edges
    c2_e = c2[rowblk[:, 0]][:, None]
    in1 = live & (wblk == c1_e)
    in2 = live & (wblk == c2_e)
    strag = live & ~in1 & ~in2

    idx1l = np.where(in1, idx_p - c1_e * W, 0).astype(np.int32)
    wn1 = np.where(in1, wn_p, 0.0).astype(np.float32)
    idx2l = np.where(in2, idx_p - c2_e * W, 0).astype(np.int32)
    wn2 = np.where(in2, wn_p, 0.0).astype(np.float32)

    s_dst, s_k = np.nonzero(strag)
    s_src = idx_p[s_dst, s_k]
    s_w = wn_p[s_dst, s_k]
    s_len = _round_up(max(len(s_dst), 1), _LANE)
    # padding entries carry w=0 and point at the LAST row so the dst list
    # stays non-decreasing (np.nonzero order) — the scatter-add is issued
    # with indices_are_sorted=True
    strag_dst = np.full(s_len, n_pad - 1, dtype=np.int32)
    strag_src = np.zeros(s_len, dtype=np.int32)
    strag_w = np.zeros(s_len, dtype=np.float32)
    strag_dst[: len(s_dst)] = s_dst
    strag_src[: len(s_dst)] = s_src
    strag_w[: len(s_dst)] = s_w

    n_live = int(live.sum())
    coverage = 1.0 - (len(s_dst) / max(n_live, 1))

    plan = WindowPlan(
        c1=jnp.asarray(c1),
        c2=jnp.asarray(c2),
        idx1l=jnp.asarray(idx1l),
        wn1=jnp.asarray(wn1),
        idx2l=jnp.asarray(idx2l),
        wn2=jnp.asarray(wn2),
        strag_dst=jnp.asarray(strag_dst),
        strag_src=jnp.asarray(strag_src),
        strag_w=jnp.asarray(strag_w),
    )
    return plan, float(coverage)


@functools.partial(jax.jit, static_argnums=(1,))
def build_onehot(plan: WindowPlan, W: int) -> jax.Array:
    """[Npad, 2W] one-hot weight matrix; columns [0, W) select from window 1,
    [W, 2W) from window 2.  Built once per solve (constant across CG iters)."""
    n_pad, k = plan.idx1l.shape
    cols = lax.broadcasted_iota(jnp.int32, (n_pad, W), 1)
    oh1 = jnp.zeros((n_pad, W), jnp.float32)
    oh2 = jnp.zeros((n_pad, W), jnp.float32)
    for a in range(k):
        oh1 = oh1 + jnp.where(
            cols == plan.idx1l[:, a][:, None], plan.wn1[:, a][:, None], 0.0
        )
        oh2 = oh2 + jnp.where(
            cols == plan.idx2l[:, a][:, None], plan.wn2[:, a][:, None], 0.0
        )
    return jnp.concatenate([oh1, oh2], axis=1)


def _matmul_kernel(W: int, precision):
    def kern(c1_ref, c2_ref, xblk, win1, win2, oh, out):
        acc = xblk[:]
        acc = acc - jnp.dot(
            oh[:, :W], win1[:], preferred_element_type=jnp.float32,
            precision=precision,
        )
        acc = acc - jnp.dot(
            oh[:, W:], win2[:], preferred_element_type=jnp.float32,
            precision=precision,
        )
        out[:] = acc

    return kern


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _window_spmv(
    plan: WindowPlan, oh: jax.Array, Xpad: jax.Array, W: int, R: int, precision
):
    n_pad, d = Xpad.shape
    b = n_pad // R

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # c1, c2
        grid=(b,),
        in_specs=[
            pl.BlockSpec((R, d), lambda i, c1, c2: (i, 0)),  # xblk
            pl.BlockSpec((W, d), lambda i, c1, c2: (c1[i], 0)),  # win1
            pl.BlockSpec((W, d), lambda i, c1, c2: (c2[i], 0)),  # win2
            pl.BlockSpec((R, 2 * W), lambda i, c1, c2: (i, 0)),  # one-hot
        ],
        out_specs=pl.BlockSpec((R, d), lambda i, c1, c2: (i, 0)),
    )
    return pl.pallas_call(
        _matmul_kernel(W, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        # CPU backend (the 8-device virtual test mesh) has no Mosaic: interpret
        interpret=jax.default_backend() != "tpu",
    )(plan.c1, plan.c2, Xpad, Xpad, Xpad, oh)


def lap_matvec_windowed(
    plan: WindowPlan,
    oh: jax.Array,
    Xpad: jax.Array,
    *,
    W: int = DEFAULT_W,
    R: int = DEFAULT_R,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Normalized-Laplacian matvec on padded rows: X - Wn (*) X.

    ``Xpad`` must have ``plan.n_pad`` rows (see `pad_rows`); ``oh`` is the
    `build_onehot(plan, W)` matrix.  Output is padded too; padded rows pass
    through as identity (their wn slots are 0).
    """
    out = _window_spmv(plan, oh, Xpad, W, R, precision)
    # straggler correction: one XLA gather + scatter-add over compact COO
    contrib = plan.strag_w[:, None] * jnp.take(Xpad, plan.strag_src, axis=0)
    return out.at[plan.strag_dst].add(
        -contrib, indices_are_sorted=True, unique_indices=False
    )


def pad_rows(x: jax.Array, n_pad: int) -> jax.Array:
    """Zero-pad axis 0 to ``n_pad`` rows."""
    n = x.shape[0]
    if n == n_pad:
        return x
    pad = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def build_window_plan_device(
    idx: jax.Array,
    wn: jax.Array,
    order: jax.Array,
    W: int,
    R: int,
    strag_cap: int,
):
    """All-device window plan: no [N, K] arrays ever cross to the host.

    Through tunneled runtimes a device->host fetch of the neighbor arrays
    costs minutes (measured 165 s for 6.3 MB), so the permutation relabeling,
    histogram window election, edge partitioning, and straggler compaction
    all run as one jitted program; callers fetch only the (coverage,
    straggler-count) scalars to accept or reject the plan.

    ``strag_cap`` bounds the compacted straggler list (static shape).  If the
    true straggler count exceeds it the list is truncated — callers MUST
    reject the plan whenever ``n_strag > strag_cap`` (they already reject far
    earlier on coverage).

    Returns (WindowPlan, coverage [scalar], n_strag [scalar]).
    """
    if W % R != 0:
        raise ValueError(f"W={W} must be a multiple of R={R}")
    n, k = idx.shape
    n_pad = _round_up(n, W)
    b = n_pad // R
    n_win = n_pad // W

    inv = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    idx_p = jnp.pad(inv[idx[order]], ((0, n_pad - n), (0, 0)))
    wn_p = jnp.pad(wn[order], ((0, n_pad - n), (0, 0)))

    live = wn_p != 0.0
    wblk = idx_p // W  # [Npad, K]
    rowblk = (jnp.arange(n_pad, dtype=jnp.int32) // R)[:, None]

    hist = jnp.zeros((b, n_win), jnp.int32).at[
        jnp.broadcast_to(rowblk, wblk.shape), wblk
    ].add(live.astype(jnp.int32))
    c1 = jnp.argmax(hist, axis=1).astype(jnp.int32)
    hist2 = hist.at[jnp.arange(b), c1].set(-1)
    c2 = jnp.argmax(hist2, axis=1).astype(jnp.int32)
    c2 = jnp.where(c2 == c1, (c1 + 1) % max(n_win, 1), c2)

    c1_e = c1[rowblk[:, 0]][:, None]
    c2_e = c2[rowblk[:, 0]][:, None]
    in1 = live & (wblk == c1_e)
    in2 = live & (wblk == c2_e)
    strag = live & ~in1 & ~in2

    idx1l = jnp.where(in1, idx_p - c1_e * W, 0).astype(jnp.int32)
    wn1 = jnp.where(in1, wn_p, 0.0)
    idx2l = jnp.where(in2, idx_p - c2_e * W, 0).astype(jnp.int32)
    wn2 = jnp.where(in2, wn_p, 0.0)

    flat = strag.reshape(-1)
    n_strag = jnp.sum(flat.astype(jnp.int32))
    # nonzero(size=...) yields ascending positions -> dst list stays sorted;
    # padding entries get fill position pointing at the LAST row with w=0
    (pos,) = jnp.nonzero(flat, size=strag_cap, fill_value=flat.shape[0] - k)
    s_dst = (pos // k).astype(jnp.int32)
    s_a = (pos % k).astype(jnp.int32)
    valid = jnp.arange(strag_cap) < n_strag
    s_dst = jnp.where(valid, s_dst, n_pad - 1)
    s_src = jnp.where(valid, idx_p[s_dst, s_a], 0).astype(jnp.int32)
    s_w = jnp.where(valid, wn_p[s_dst, s_a], 0.0)

    n_live = jnp.maximum(jnp.sum(live.astype(jnp.int32)), 1)
    coverage = 1.0 - n_strag.astype(jnp.float32) / n_live.astype(jnp.float32)

    plan = WindowPlan(
        c1=c1, c2=c2, idx1l=idx1l, wn1=wn1, idx2l=idx2l, wn2=wn2,
        strag_dst=s_dst, strag_src=s_src, strag_w=s_w,
    )
    return plan, coverage, n_strag
