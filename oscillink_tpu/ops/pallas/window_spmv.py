"""Windowed block-sparse Laplacian matvec: contiguous DMA + one-hot MXU.

The hot op of every CG iteration is the k-sparse normalized-Laplacian matvec
(reference analog: the dense ``L_sym @ X`` in oscillink/core/lattice.py:177).
The padded-row XLA formulation (`ops.graph.lap_matvec`) is bound by the TPU
gather engine, which we measured at ~200 GB/s *independent of index pattern*
(sequential == random == local; benchmarks/probe_gather.py) — ~4x under the
HBM streaming rate.  This kernel sidesteps the gather engine entirely:

  * rows are processed in blocks of R; for each row block the plan elects
    the n_windows (2 or 3) most-popular W-aligned row *windows* of X (after
    locality ordering, mutual-kNN neighbors concentrate near the diagonal —
    parallel/reorder.py gives the ordering);
  * the within-window selection is a [R, n_windows*W] one-hot *weight*
    matrix, constant across CG iterations, built ONCE per graph by
    `build_onehot` and streamed per iteration; per grid step the kernel
    pulls the windows and one-hot block into VMEM with contiguous
    block-spec DMAs (pipelined by Pallas) and runs one MXU matmul per
    window in three bf16 passes (double-bf16 split — f32-level accuracy at
    half the cost of Mosaic's six-pass HIGHEST lowering);
  * edges outside every window ("stragglers") are grouped by destination
    row block; the kernel DMAs each block's segment of per-iteration
    contribution rows from HBM (overlapping the window matmuls) and applies
    them with an exact-bf16 0/1 one-hot matmul while the output block is
    still in VMEM — replacing an XLA scatter epilogue that cost
    ~2 ms/apply at N=100k regardless of straggler count.

Three windows cover a wider neighbor span (the 2-window geometry caps
coverage at ~0.95 when a block's neighbor spread exceeds 2W) at the price
of a 1.5x-wider one-hot; callers pick per regime (the one-hot costs
n_windows*W*4 bytes/row of HBM).  For adversarially random graphs the plan
reports low coverage and callers keep the XLA path.
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
    "OneHots",
    "build_window_plan",
    "build_window_plan_device",
    "build_onehot",
    "plan_s_max",
    "lap_matvec_windowed",
    "k_matvec_windowed",
    "pad_rows",
    "lowcov_smax_bound",
    "accept_window_plan",
]

DEFAULT_W = 512  # window rows (must be a multiple of R)
DEFAULT_R = 256  # output row-block rows
DEFAULT_SMAX = 512  # per-block straggler segment rows DMA'd by the kernel
_LANE = 8


class WindowPlan(NamedTuple):
    """Device-resident window plan (a pytree of arrays only; the static
    W/R geometry is passed separately so jit treats it as compile-time;
    the window count is carried by the leading axis of ``cs``).

    Straggler layout: entries are grouped by DESTINATION ROW BLOCK — block
    i's stragglers occupy `[strag_off[i], strag_off[i] + p_i)` where p_i is
    the block's count rounded up to 8 (padding entries carry w=0 and point
    their dst at the block's last row, keeping the global dst order
    non-decreasing).  The kernel DMAs a fixed `[s_max]`-row slice starting
    at `strag_off[i]`; reads past a block's own segment are masked out by
    the straggler one-hot."""

    cs: jax.Array  # [n_win, B] int32 — elected window ids (units of W rows)
    idxl: jax.Array  # [n_win, Npad, K] int32 — in-window local col ids
    wnl: jax.Array  # [n_win, Npad, K] f32 — in-window edge weights (0 unused)
    strag_dst: jax.Array  # [S] int32 — straggler destination rows (sorted)
    strag_src: jax.Array  # [S] int32 — straggler source rows
    strag_w: jax.Array  # [S] f32 — straggler weights (0 on padding)
    strag_off: jax.Array  # [B] int32 — block i's segment start (multiple of 8)
    strag_cnt: jax.Array  # [B] int32 — block i's padded count (0 = kernel skips)

    @property
    def n_pad(self) -> int:
        return self.idxl.shape[1]

    @property
    def n_blocks(self) -> int:
        return self.cs.shape[1]

    @property
    def n_windows(self) -> int:
        return self.cs.shape[0]


class OneHots(NamedTuple):
    """Per-solve one-hot operands for the windowed kernel.

    main:  [Npad, n_windows*W] f32 — window selection weights (wn folded
           in); columns [w*W, (w+1)*W) select from window w.
    strag: [Npad, s_max] bf16 — 0/1 straggler selection (exact in bf16);
           column s of row r selects straggler entry strag_off[blk(r)] + s.
    """

    main: jax.Array
    strag: jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_window_plan(
    idx: np.ndarray,
    wn: np.ndarray,
    *,
    W: int = DEFAULT_W,
    R: int = DEFAULT_R,
    n_windows: int = 2,
) -> tuple[WindowPlan, float]:
    """Build the window plan on host. Returns (plan, coverage in [0, 1]).

    ``idx``/``wn`` are the padded [N, K] neighbor arrays of `ops.graph.Graph`
    (wn == 0 marks padding). Vectorized NumPy throughout — no per-edge Python
    loops (VERDICT r1: build_halo_plan's Python loops were the anti-pattern).
    """
    if n_windows < 1:
        raise ValueError("n_windows must be >= 1")
    idx = np.asarray(idx)
    wn = np.asarray(wn)
    n, k = idx.shape
    # rows pad to a multiple of both the window and the row-block size (the
    # two blockings are independent; W=384/R=256 is a valid geometry)
    n_pad = _round_up(n, int(np.lcm(W, R)))
    b = n_pad // R

    idx_p = np.zeros((n_pad, k), dtype=np.int32)
    wn_p = np.zeros((n_pad, k), dtype=np.float32)
    idx_p[:n] = idx
    wn_p[:n] = wn

    live = wn_p != 0.0
    wblk = idx_p // W  # [Npad, K] window id of each edge
    rowblk = (np.arange(n_pad) // R)[:, None]  # [Npad, 1]

    # histogram of live edges per (row block, window); elect the n_windows
    # most-popular windows per block
    n_aligned = n_pad // W
    hist = np.zeros((b, n_aligned), dtype=np.int64)
    np.add.at(hist, (np.broadcast_to(rowblk, wblk.shape)[live], wblk[live]), 1)

    cs = np.zeros((n_windows, b), dtype=np.int32)
    h = hist.copy()
    for w in range(n_windows):
        cw = np.argmax(h, axis=1).astype(np.int32)
        # degenerate blocks (fewer populated windows than n_windows): point
        # the election somewhere distinct so window ids never collide
        for prev in range(w):
            clash = cw == cs[prev]
            cw[clash] = (cw[clash] + 1 + prev) % max(n_aligned, 1)
        h[np.arange(b), cw] = -1
        cs[w] = cw

    in_any = np.zeros_like(live)
    idxl = np.zeros((n_windows, n_pad, k), dtype=np.int32)
    wnl = np.zeros((n_windows, n_pad, k), dtype=np.float32)
    for w in range(n_windows):
        cw_e = cs[w][rowblk[:, 0]][:, None]
        in_w = live & (wblk == cw_e) & ~in_any
        idxl[w] = np.where(in_w, idx_p - cw_e * W, 0)
        wnl[w] = np.where(in_w, wn_p, 0.0)
        in_any |= in_w
    strag = live & ~in_any

    s_dst, s_k = np.nonzero(strag)  # row-major -> sorted by dst -> by block
    s_src = idx_p[s_dst, s_k]
    s_w = wn_p[s_dst, s_k]

    # block-grouped padded layout (see WindowPlan docstring): block i's
    # segment is 8-aligned; padding entries point at the block's last row
    # with w=0 so the global dst order stays non-decreasing
    blk_e = s_dst // R
    counts = np.bincount(blk_e, minlength=b)
    padded = ((counts + _LANE - 1) // _LANE) * _LANE
    off = np.zeros(b + 1, dtype=np.int64)
    off[1:] = np.cumsum(padded)
    p_max = int(padded.max()) if len(s_dst) else 0
    # tail slack so a [strag_off[i], strag_off[i] + s_max) DMA stays in
    # bounds for any s_max <= plan_s_max(plan)
    s_len = int(off[b - 1]) + max(128, _round_up(p_max, 128)) if b else 128

    blk_of_pos = np.clip(
        np.searchsorted(off, np.arange(s_len), side="right") - 1, 0, b - 1
    )
    strag_dst = (blk_of_pos * R + (R - 1)).astype(np.int32)
    strag_src = np.zeros(s_len, dtype=np.int32)
    strag_w = np.zeros(s_len, dtype=np.float32)
    start = np.zeros(b, dtype=np.int64)
    start[1:] = np.cumsum(counts)[:-1]
    tgt = off[blk_e] + (np.arange(len(s_dst)) - start[blk_e])
    strag_dst[tgt] = s_dst
    strag_src[tgt] = s_src
    strag_w[tgt] = s_w

    n_live = int(live.sum())
    coverage = 1.0 - (len(s_dst) / max(n_live, 1))

    plan = WindowPlan(
        cs=jnp.asarray(cs),
        idxl=jnp.asarray(idxl),
        wnl=jnp.asarray(wnl),
        strag_dst=jnp.asarray(strag_dst),
        strag_src=jnp.asarray(strag_src),
        strag_w=jnp.asarray(strag_w),
        strag_off=jnp.asarray(off[:b].astype(np.int32)),
        strag_cnt=jnp.asarray(padded.astype(np.int32)),
    )
    return plan, float(coverage)


def plan_s_max(plan: WindowPlan) -> int:
    """Host-side s_max for `build_onehot`: the largest per-block padded
    straggler segment, rounded up to 128 (min 128).  Guaranteed to satisfy
    the kernel's DMA bound by `build_window_plan`'s tail slack."""
    w = np.asarray(plan.strag_w)
    dst = np.asarray(plan.strag_dst)
    b = plan.n_blocks
    r = plan.n_pad // b
    live = w != 0.0
    if not live.any():
        return 128
    counts = np.bincount(dst[live] // r, minlength=b)
    p_max = int(np.ceil(counts.max() / _LANE) * _LANE)
    return max(128, _round_up(p_max, 128))


@functools.partial(jax.jit, static_argnums=(1, 2))
def build_onehot(plan: WindowPlan, W: int, s_max: int = DEFAULT_SMAX) -> OneHots:
    """One-hot operands, built once per graph (constant across CG iters).

    main [Npad, n_windows*W]: columns [w*W, (w+1)*W) select from window w,
    with edge weights folded in.  strag [Npad, s_max] bf16: 0/1 selection
    of the block's straggler segment (weights live in the per-apply
    contribution buffer instead, so bf16 is exact)."""
    n_win, n_pad, k = plan.idxl.shape
    cols = lax.broadcasted_iota(jnp.int32, (n_pad, W), 1)
    parts = []
    for w in range(n_win):
        oh_w = jnp.zeros((n_pad, W), jnp.float32)
        for a in range(k):
            oh_w = oh_w + jnp.where(
                cols == plan.idxl[w, :, a][:, None],
                plan.wnl[w, :, a][:, None],
                0.0,
            )
        parts.append(oh_w)
    main = jnp.concatenate(parts, axis=1)

    b = plan.n_blocks
    r = n_pad // b
    rows = jnp.arange(n_pad, dtype=jnp.int32)
    e = plan.strag_off[rows // r][:, None] + jnp.arange(s_max, dtype=jnp.int32)
    hit = (plan.strag_dst[e] == rows[:, None]) & (plan.strag_w[e] != 0.0)
    return OneHots(main=main, strag=hit.astype(jnp.bfloat16))


def _dot3(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32-accurate matmul in three bf16 MXU passes (double-bf16 split):
    a@b = a_hi@b_hi + a_hi@b_lo + a_lo@b_hi + O(2^-22 rel).  Mosaic lowers
    HIGHEST f32 dots to six bf16 passes; the explicit split halves the MXU
    time at ~1e-6 relative error — far inside the CG solve tolerance and the
    kernel-parity bound (tests/test_window_spmv.py: rel < 1e-5)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _dot2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Two bf16 MXU passes: full-precision ``a`` against truncated ``b_hi``
    (a@b ≈ a_hi@b_hi + a_lo@b_hi).  Relative error ~2^-9 (~2e-3 worst case)
    from the dropped a·b_lo term — outside the deltaH receipt-parity
    contract, which is why this is OPT-IN (`OSCILLINK_WINDOW_PRECISION`),
    never the default.  The one-hot (``a``, persistent edge weights) keeps
    both halves; the per-iteration CG vector ``b`` is the truncated operand.
    Measured on-chip at the 125k shard: saves only ~0.11 ms/apply — the
    kernel is DMA-bound (benchmarks/window_precision_125k.json)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_lo, b_hi)


def _window_dot(oh, win, precision):
    if precision == "bf16x3":
        return _dot3(oh, win)
    if precision == "bf16x2":
        return _dot2(oh, win)
    if precision in ("oh16", "dma16"):
        # bf16-STORED one-hot (caller casts OneHots.main at build time):
        # halves the [Npad, n_win*W] per-iteration HBM stream — the largest
        # term in the kernel's gap to its streaming bound (NORTHSTAR.md).
        # Two MXU passes against the split X window keep the X side
        # f32-accurate; the operator error is the one-hot's own bf16
        # quantization (~2^-9 relative on edge weights), same magnitude as
        # the bf16x2 tier — OPT-IN, never the receipt-parity default.
        # "dma16" extends the same trade to the straggler contribution
        # buffer (see _window_spmv3/_window_spmv3f) — the dominant stream
        # on LOW-coverage plans accepted by the bounded-straggler rule.
        a = oh if oh.dtype == jnp.bfloat16 else oh.astype(jnp.bfloat16)
        b_hi = win.astype(jnp.bfloat16)
        b_lo = (win - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        return dot(a, b_hi) + dot(a, b_lo)
    if precision == "bf16":
        return jnp.dot(
            oh.astype(jnp.bfloat16),
            win.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(
        oh, win, preferred_element_type=jnp.float32, precision=precision
    )


def _env_precision() -> str:
    """Resolve the window-pass precision tier from the environment.

    ``OSCILLINK_WINDOW_PRECISION`` ∈ {"bf16x3" (default, receipt-parity
    grade), "bf16x2" (~2e-3 operator error, one MXU pass fewer), "oh16"
    (~2e-3, bf16-STORED one-hot: halves the per-iteration one-hot HBM
    stream; the lattice casts OneHots.main at ctx build), "dma16" (oh16
    PLUS a bf16-stored straggler contribution buffer — halves the straggler
    gather write + per-block DMA, the dominant stream on low-coverage
    plans; ~2e-3 like oh16), "bf16" (~8e-3, single pass)}.  Read at TRACE
    time: jitted callers bake the tier into their compiled program, so set
    it before the first solve."""
    import os

    v = os.getenv("OSCILLINK_WINDOW_PRECISION", "bf16x3").strip().lower()
    return v if v in ("bf16x3", "bf16x2", "bf16", "oh16", "dma16") else "bf16x3"


def lowcov_smax_bound() -> int:
    """Low-coverage acceptance bound on the straggler DMA window (rows).

    ``OSCILLINK_WINDOWED_LOWCOV_SMAX`` (default 768): a window plan whose
    per-block straggler segments all fit a DMA window of at most this many
    rows is accepted even when coverage sits under the coverage bar.
    Measured at the 125k north-star shard the kernel is straggler-VOLUME
    bound, not coverage bound: the real clustered 1M graph gives cov 0.067
    at s_max 512 and the fused cg5 still runs 74.9 ms (beats the f32
    gather's 117.6 — benchmarks/northstar_e2e_125k.json), while the real
    isotropic graph gives cov 0.019 at s_max 2560 and loses (165 ms cg4 vs
    bf16-gather 89.8 — benchmarks/iso_straggler_125k.json).  The
    controlled straggler-volume sweep (benchmarks/smax_sweep_125k.json)
    brackets the crossover: windowed 9.2 / 13.0 ms/apply at s_max
    384 / 768 (beats both gather tiers, f32 ~15.1 / bf16 ~13.7-14.0) and
    19.8 at 1152 (loses) — 768 is the last measured winning point, hence
    the default.  "0" disables the rule (coverage-only gate, the
    pre-round-5 behavior)."""
    import os

    try:
        return int(os.getenv("OSCILLINK_WINDOWED_LOWCOV_SMAX", "768"))
    except ValueError:
        return 768


def accept_window_plan(
    cov: float,
    n_strag: float,
    fits: bool,
    s_max: int,
    strag_cap: float,
    *,
    forced: bool,
    min_cov: float,
    lowcov_bound: int,
) -> tuple[bool, str]:
    """Router acceptance for a window plan: ``(accept, reason)``.

    Correctness first: a truncated straggler list or a non-fitting DMA
    window is never accepted, even forced.  Otherwise accept on forced
    mode, on the coverage bar, or — the round-5 rule — on a bounded
    straggler volume (``s_max <= lowcov_bound``), since the kernel's cost
    scales with the per-block straggler DMA window, not with coverage
    (see `lowcov_smax_bound`)."""
    if n_strag > strag_cap or not fits:
        return False, "straggler overflow"
    if forced:
        return True, "forced"
    if cov >= min_cov:
        return True, "coverage"
    if 0 < lowcov_bound and s_max <= lowcov_bound:
        return True, "bounded stragglers"
    return False, "low coverage"


def _matmul_kernel(W: int, n_win: int, precision):
    def kern(*refs):
        # refs: c_0..c_{n_win-1} | xblk, win_0.., oh | out
        xblk = refs[n_win]
        wins = refs[n_win + 1 : 2 * n_win + 1]
        oh = refs[2 * n_win + 1]
        out = refs[2 * n_win + 2]
        acc = xblk[:]
        for w in range(n_win):
            acc = acc - _window_dot(oh[:, w * W : (w + 1) * W], wins[w][:], precision)
        out[:] = acc

    return kern


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _window_spmv(
    plan: WindowPlan, oh: jax.Array, Xpad: jax.Array, W: int, R: int, precision
):
    n_pad, d = Xpad.shape
    b = n_pad // R
    n_win = plan.n_windows

    def win_spec(w):
        return pl.BlockSpec((W, d), lambda i, *cs, w=w: (cs[w][i], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_win,  # per-window elected ids
        grid=(b,),
        in_specs=[
            pl.BlockSpec((R, d), lambda i, *cs: (i, 0)),  # xblk
            *[win_spec(w) for w in range(n_win)],
            pl.BlockSpec((R, n_win * W), lambda i, *cs: (i, 0)),  # one-hot
        ],
        out_specs=pl.BlockSpec((R, d), lambda i, *cs: (i, 0)),
    )
    return pl.pallas_call(
        _matmul_kernel(W, n_win, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        # CPU backend (the 8-device virtual test mesh) has no Mosaic: interpret
        interpret=jax.default_backend() != "tpu",
    )(*[plan.cs[w] for w in range(n_win)], Xpad, *([Xpad] * n_win), oh)


def _matmul_kernel3(W: int, n_win: int, S_max: int, precision):
    """Window matmuls + in-kernel straggler correction.

    The per-block straggler contributions are DMA'd manually from the
    compact HBM buffer at the block's (8-aligned, scalar-prefetched) offset
    — overlapping the window matmuls — and applied as an exact-bf16 0/1
    one-hot matmul on the MXU while the output block is still in VMEM.
    This replaces the XLA scatter-add epilogue, whose read-modify-write of
    the full [Npad, D] output cost ~2 ms/apply at N=100k regardless of
    straggler count."""

    def kern(*refs):
        # refs: c_0..c_{n_win-1}, off, cnt | xblk, win_0.., oh, oh3, c_hbm |
        #       out | c_vmem, sem
        off_ref = refs[n_win]
        cnt_ref = refs[n_win + 1]
        base = n_win + 2
        xblk = refs[base]
        wins = refs[base + 1 : base + 1 + n_win]
        oh = refs[base + 1 + n_win]
        oh3 = refs[base + 2 + n_win]
        c_hbm = refs[base + 3 + n_win]
        out = refs[base + 4 + n_win]
        c_vmem = refs[base + 5 + n_win]
        sem = refs[base + 6 + n_win]

        i = pl.program_id(0)
        # on locality-ordered corpora most blocks have NO stragglers
        # (measured at 125k x k8: p50 = 0, 17x DMA overfetch from the
        # unconditional [s_max, D] fetch) — predicate the DMA and the
        # correction matmuls on the prefetched per-block count
        has = cnt_ref[i] > 0
        # offsets are 8-aligned by plan construction; Mosaic needs the hint
        # to tile the HBM slice
        off = pl.multiple_of(off_ref[i], _LANE)

        @pl.when(has)
        def _start_dma():
            pltpu.make_async_copy(
                c_hbm.at[pl.ds(off, S_max), :], c_vmem, sem
            ).start()

        acc = xblk[:]
        for w in range(n_win):
            acc = acc - _window_dot(oh[:, w * W : (w + 1) * W], wins[w][:], precision)

        @pl.when(has)
        def _correct():
            pltpu.make_async_copy(
                c_hbm.at[pl.ds(off, S_max), :], c_vmem, sem
            ).wait()
            c = c_vmem[:]
            if precision == "dma16":
                # contribs are STORED bf16 (half the per-block DMA); the
                # one-hot is exact in bf16, so a single MXU pass with f32
                # accumulate carries only the storage quantization (~2^-9)
                corr = jnp.dot(oh3[:], c, preferred_element_type=jnp.float32)
            else:
                # oh3 is exact in bf16 (0/1); split c so the product is
                # f32-accurate
                c_hi = c.astype(jnp.bfloat16)
                c_lo = (c - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                corr = jnp.dot(oh3[:], c_hi, preferred_element_type=jnp.float32)
                corr = corr + jnp.dot(
                    oh3[:], c_lo, preferred_element_type=jnp.float32
                )
            out[:] = acc - corr

        @pl.when(jnp.logical_not(has))
        def _passthrough():
            out[:] = acc

    return kern


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _window_spmv3(
    plan: WindowPlan,
    oh: jax.Array,
    oh3: jax.Array,
    Xpad: jax.Array,
    W: int,
    R: int,
    S_max: int,
    precision,
):
    n_pad, d = Xpad.shape
    b = n_pad // R
    n_win = plan.n_windows
    c_dtype = jnp.bfloat16 if precision == "dma16" else jnp.float32
    contrib = (plan.strag_w[:, None] * jnp.take(Xpad, plan.strag_src, axis=0)).astype(
        c_dtype
    )

    def win_spec(w):
        return pl.BlockSpec((W, d), lambda i, *pre, w=w: (pre[w][i], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_win + 2,  # elected ids + strag_off + strag_cnt
        grid=(b,),
        in_specs=[
            pl.BlockSpec((R, d), lambda i, *pre: (i, 0)),  # xblk
            *[win_spec(w) for w in range(n_win)],
            pl.BlockSpec((R, n_win * W), lambda i, *pre: (i, 0)),  # one-hot
            pl.BlockSpec((R, S_max), lambda i, *pre: (i, 0)),  # strag oh
            pl.BlockSpec(memory_space=pltpu.ANY),  # contribs stay in HBM
        ],
        out_specs=pl.BlockSpec((R, d), lambda i, *pre: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((S_max, d), c_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _matmul_kernel3(W, n_win, S_max, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the [S_max, D] straggler scratch + double-buffered window
            # blocks sit ~0.4 MB over Mosaic's 16 MB default scoped-vmem
            # budget at the 125k/768 shard (measured: 16.35 MB); the chip
            # has 128 MB physical VMEM — lift the soft cap
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(
        *[plan.cs[w] for w in range(n_win)],
        plan.strag_off,
        plan.strag_cnt,
        Xpad,
        *([Xpad] * n_win),
        oh,
        oh3,
        contrib,
    )


def _matmul_kernel3f(W: int, n_win: int, S_max: int, precision):
    """Fused-operator variant of `_matmul_kernel3`: computes
    ``out = g ⊙ x − Wn x`` (the caller folds the operator's full diagonal,
    divided by the off-diagonal scale, into ``g``) and, while the output
    block is still VMEM-resident, the per-column partial reduction
    ``pap = Σ_rows x ⊙ out`` — the CG denominator ⟨p, Kp⟩ — so the solver
    never pays a separate [N, D] reduction pass over p and Ap."""

    def kern(*refs):
        # refs: c_0..c_{n_win-1}, off, cnt | xblk, g, win_0.., oh, oh3,
        #       c_hbm | out, pap | c_vmem, sem
        off_ref = refs[n_win]
        cnt_ref = refs[n_win + 1]
        base = n_win + 2
        xblk = refs[base]
        gref = refs[base + 1]
        wins = refs[base + 2 : base + 2 + n_win]
        oh = refs[base + 2 + n_win]
        oh3 = refs[base + 3 + n_win]
        c_hbm = refs[base + 4 + n_win]
        out = refs[base + 5 + n_win]
        pap = refs[base + 6 + n_win]
        c_vmem = refs[base + 7 + n_win]
        sem = refs[base + 8 + n_win]

        i = pl.program_id(0)
        has = cnt_ref[i] > 0
        off = pl.multiple_of(off_ref[i], _LANE)

        @pl.when(has)
        def _start_dma():
            pltpu.make_async_copy(
                c_hbm.at[pl.ds(off, S_max), :], c_vmem, sem
            ).start()

        x = xblk[:]
        acc = gref[:] * x
        for w in range(n_win):
            acc = acc - _window_dot(oh[:, w * W : (w + 1) * W], wins[w][:], precision)

        @pl.when(has)
        def _correct():
            pltpu.make_async_copy(
                c_hbm.at[pl.ds(off, S_max), :], c_vmem, sem
            ).wait()
            c = c_vmem[:]
            if precision == "dma16":
                # bf16-stored contribs: one exact-one-hot MXU pass
                corr = jnp.dot(oh3[:], c, preferred_element_type=jnp.float32)
            else:
                c_hi = c.astype(jnp.bfloat16)
                c_lo = (c - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                corr = jnp.dot(oh3[:], c_hi, preferred_element_type=jnp.float32)
                corr = corr + jnp.dot(
                    oh3[:], c_lo, preferred_element_type=jnp.float32
                )
            res = acc - corr
            out[:] = res
            # pap block is (1, 8, d) — Mosaic needs the last two dims
            # (8, d%128==0)-tiled, so the (1, d) partial is broadcast over
            # the 8 sublanes; the caller reads sublane 0 only
            pap[:] = jnp.broadcast_to(
                jnp.sum(x * res, axis=0)[None, None, :], pap.shape
            )

        @pl.when(jnp.logical_not(has))
        def _passthrough():
            out[:] = acc
            pap[:] = jnp.broadcast_to(
                jnp.sum(x * acc, axis=0)[None, None, :], pap.shape
            )

    return kern


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _window_spmv3f(
    plan: WindowPlan,
    oh: jax.Array,
    oh3: jax.Array,
    Xpad: jax.Array,
    g: jax.Array,
    W: int,
    R: int,
    S_max: int,
    precision,
):
    n_pad, d = Xpad.shape
    b = n_pad // R
    n_win = plan.n_windows
    c_dtype = jnp.bfloat16 if precision == "dma16" else jnp.float32
    contrib = (plan.strag_w[:, None] * jnp.take(Xpad, plan.strag_src, axis=0)).astype(
        c_dtype
    )

    def win_spec(w):
        return pl.BlockSpec((W, d), lambda i, *pre, w=w: (pre[w][i], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_win + 2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((R, d), lambda i, *pre: (i, 0)),  # xblk
            pl.BlockSpec((R, 1), lambda i, *pre: (i, 0)),  # g (diag/scale)
            *[win_spec(w) for w in range(n_win)],
            pl.BlockSpec((R, n_win * W), lambda i, *pre: (i, 0)),  # one-hot
            pl.BlockSpec((R, S_max), lambda i, *pre: (i, 0)),  # strag oh
            pl.BlockSpec(memory_space=pltpu.ANY),  # contribs stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((R, d), lambda i, *pre: (i, 0)),
            # per-block pap partial: (1, 8, d) block so the trailing two
            # dims satisfy Mosaic's (8, 128) tiling; sublane 0 carries the
            # value (broadcast in-kernel), the rest is padding
            pl.BlockSpec((1, 8, d), lambda i, *pre: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((S_max, d), c_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, pap = pl.pallas_call(
        _matmul_kernel3f(W, n_win, S_max, precision),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # see _window_spmv3: the straggler scratch overruns the 16 MB
            # default scoped-vmem budget at the 125k/768 shard
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(
        *[plan.cs[w] for w in range(n_win)],
        plan.strag_off,
        plan.strag_cnt,
        Xpad,
        g,
        *([Xpad] * n_win),
        oh,
        oh3,
        contrib,
    )
    return out, jnp.sum(pap[:, 0, :], axis=0)


def k_matvec_windowed(
    plan: WindowPlan,
    oh: OneHots,
    Xpad: jax.Array,
    g: jax.Array,
    *,
    W: int | None = None,
    R: int | None = None,
    precision=None,
) -> tuple[jax.Array, jax.Array]:
    """Fused operator apply: ``(g ⊙ X − Wn X,  per-column Σ_rows X⊙K(X))``.

    The caller folds the operator's full diagonal, divided by the
    off-diagonal scale s, into ``g`` ([n_pad, 1] f32): the stationary
    operator M = λ_G I + λ_C L + λ_Q diag(B) becomes M X = s·K(X) with
    s = λ_C and g = (λ_G + λ_C + λ_Q B)/s (L X = X − Wn X, so the
    Laplacian's own identity term joins the diagonal).  The second return
    is the exact CG denominator ⟨p, Kp⟩ per column, computed in-kernel
    while the output block is VMEM-resident — replacing the separate
    [N, D] reduction pass of every CG iteration.  Padded rows contribute 0
    to both outputs provided Xpad's padding is zero (`pad_rows`
    zero-fills; the CG invariants keep it zero).

    Non-TPU backends (the virtual test mesh) and non-128-multiple D
    compose the same quantities from `lap_matvec_windowed`:
    K(X) = (g − 1) ⊙ X + L_win X.
    """
    if W is None:
        W = oh.main.shape[1] // plan.n_windows
    if R is None:
        R = plan.n_pad // plan.n_blocks
    if precision is None:
        precision = _env_precision()
    if jax.default_backend() == "tpu" and Xpad.shape[1] % 128 == 0:
        return _window_spmv3f(
            plan, oh.main, oh.strag, Xpad, g, W, R, oh.strag.shape[1], precision
        )
    out = (g - 1.0) * Xpad + lap_matvec_windowed(
        plan, oh, Xpad, W=W, R=R, precision=precision
    )
    return out, jnp.sum(Xpad * out, axis=0)


def lap_matvec_windowed(
    plan: WindowPlan,
    oh: OneHots,
    Xpad: jax.Array,
    *,
    W: int | None = None,
    R: int | None = None,
    precision=None,
) -> jax.Array:
    """Normalized-Laplacian matvec on padded rows: X - Wn (*) X.

    ``Xpad`` must have ``plan.n_pad`` rows (see `pad_rows`); ``oh`` comes
    from `build_onehot(plan, W, s_max)`.  W/R default to the geometry the
    plan was built with (derived statically from array shapes).  Output is
    padded too; padded rows pass through as identity (their wn slots are 0).
    On TPU the straggler correction runs inside the kernel
    (`_matmul_kernel3`); the interpreted CPU path (test mesh) keeps the
    windows kernel + XLA scatter epilogue.
    """
    if W is None:
        W = oh.main.shape[1] // plan.n_windows
    if R is None:
        R = plan.n_pad // plan.n_blocks
    if precision is None:
        precision = _env_precision()
    # the in-kernel straggler DMA slices [s_max, D] from HBM; Mosaic
    # requires the lane dimension 128-aligned — narrow D (e.g. small
    # embeddings or thin column chunks) takes the scatter epilogue instead
    if jax.default_backend() == "tpu" and Xpad.shape[1] % 128 == 0:
        return _window_spmv3(
            plan, oh.main, oh.strag, Xpad, W, R, oh.strag.shape[1], precision
        )
    out = _window_spmv(plan, oh.main, Xpad, W, R, precision)
    contrib = plan.strag_w[:, None] * jnp.take(Xpad, plan.strag_src, axis=0)
    if precision == "dma16":
        # mirror the TPU kernel's bf16-STORED contribution buffer so the
        # interpreted/test-mesh path produces the same per-edge values
        contrib = contrib.astype(jnp.bfloat16).astype(jnp.float32)
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


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def build_window_plan_device(
    idx: jax.Array,
    wn: jax.Array,
    order: jax.Array,
    W: int,
    R: int,
    strag_cap: int,
    s_max: int = DEFAULT_SMAX,
    n_windows: int = 2,
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
    earlier on coverage).  ``s_max`` is the kernel's per-block DMA window;
    callers must also reject when ``fits`` is false (a block's padded
    straggler segment exceeds ``s_max``, or the last block's DMA window
    would run past ``strag_cap``).

    Returns (WindowPlan, coverage [scalar], n_strag [scalar], fits [scalar]).
    """
    n, k = idx.shape
    n_pad = _round_up(n, int(np.lcm(W, R)))
    b = n_pad // R
    n_aligned = n_pad // W

    inv = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    idx_p = jnp.pad(inv[idx[order]], ((0, n_pad - n), (0, 0)))
    wn_p = jnp.pad(wn[order], ((0, n_pad - n), (0, 0)))

    live = wn_p != 0.0
    wblk = idx_p // W  # [Npad, K]
    rowblk = (jnp.arange(n_pad, dtype=jnp.int32) // R)[:, None]

    hist = jnp.zeros((b, n_aligned), jnp.int32).at[
        jnp.broadcast_to(rowblk, wblk.shape), wblk
    ].add(live.astype(jnp.int32))

    cs_list = []
    h = hist
    for w in range(n_windows):
        cw = jnp.argmax(h, axis=1).astype(jnp.int32)
        for prev in range(w):
            cw = jnp.where(
                cw == cs_list[prev], (cw + 1 + prev) % max(n_aligned, 1), cw
            )
        h = h.at[jnp.arange(b), cw].set(-1)
        cs_list.append(cw)
    cs = jnp.stack(cs_list)

    in_any = jnp.zeros_like(live)
    idxl_list, wnl_list = [], []
    for w in range(n_windows):
        cw_e = cs[w][rowblk[:, 0]][:, None]
        in_w = live & (wblk == cw_e) & ~in_any
        idxl_list.append(jnp.where(in_w, idx_p - cw_e * W, 0).astype(jnp.int32))
        wnl_list.append(jnp.where(in_w, wn_p, 0.0))
        in_any = in_any | in_w
    strag = live & ~in_any

    flat = strag.reshape(-1)
    n_strag = jnp.sum(flat.astype(jnp.int32))
    # nonzero(size=...) yields ascending positions -> entries arrive sorted
    # by dst and therefore grouped by destination row block
    (pos,) = jnp.nonzero(flat, size=strag_cap, fill_value=flat.shape[0] - k)
    e_dst = (pos // k).astype(jnp.int32)
    e_a = (pos % k).astype(jnp.int32)
    valid = jnp.arange(strag_cap) < n_strag
    e_src = jnp.where(valid, idx_p[e_dst, e_a], 0).astype(jnp.int32)
    e_w = jnp.where(valid, wn_p[e_dst, e_a], 0.0)

    # block-grouped padded layout (see WindowPlan docstring)
    blk_e = e_dst // R
    counts = jnp.zeros(b, jnp.int32).at[blk_e].add(valid.astype(jnp.int32))
    padded = ((counts + _LANE - 1) // _LANE) * _LANE
    off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    p_max = jnp.max(padded)
    fits = (p_max <= s_max) & (off[b - 1] + s_max <= strag_cap)
    start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    rank = jnp.arange(strag_cap, dtype=jnp.int32) - start[blk_e]
    tgt = jnp.where(valid, off[blk_e] + rank, strag_cap)  # OOB -> dropped

    blk_of_pos = jnp.clip(
        jnp.searchsorted(off, jnp.arange(strag_cap, dtype=jnp.int32), side="right")
        - 1,
        0,
        b - 1,
    ).astype(jnp.int32)
    s_dst = (blk_of_pos * R + (R - 1)).at[tgt].set(e_dst, mode="drop")
    s_src = jnp.zeros(strag_cap, jnp.int32).at[tgt].set(e_src, mode="drop")
    s_w = jnp.zeros(strag_cap, jnp.float32).at[tgt].set(e_w, mode="drop")

    n_live = jnp.maximum(jnp.sum(live.astype(jnp.int32)), 1)
    coverage = 1.0 - n_strag.astype(jnp.float32) / n_live.astype(jnp.float32)

    plan = WindowPlan(
        cs=cs,
        idxl=jnp.stack(idxl_list),
        wnl=jnp.stack(wnl_list),
        strag_dst=s_dst,
        strag_src=s_src,
        strag_w=s_w,
        strag_off=off,
        strag_cnt=padded.astype(jnp.int32),
    )
    return plan, coverage, n_strag, fits
