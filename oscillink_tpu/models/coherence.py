"""The coherence-lattice energy model and its SPD operator algebra.

Energy (reference README.md:192-204, docs/foundations/SPEC.md:3-18):

    H(U) = lamG ||U - Y||_F^2 + lamC tr(U^T L_sym U)
         + lamQ tr((U - 1 psi^T)^T B (U - 1 psi^T)) + lamP tr(U^T L_path U)

Stationary point:  M U* = lamG Y + lamQ B 1 psi^T,
    M = lamG I + lamC L_sym + lamQ B + lamP L_path        (SPD for lamG > 0).

Implicit Euler settle step (reference lattice.py:159-230):
    (I + dt M) U+ = U + dt (lamG Y + lamQ B 1 psi^T).

All functions here are pure and jittable over a `LatticeOperand` pytree; the
Laplacian matvecs are the k-sparse gather-SpMV ops from `oscillink_tpu.ops`.
Lambdas / dt / tol / max_iters are dynamic scalars so parameter retuning never
triggers recompilation; only shapes (N, D, K, E_path) are static.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.graph import Graph, lap_matvec
from ..ops.path import PathGraph, path_lap_matvec
from ..ops.solver import LOWMEM_SOLVE_BYTES, cg_solve, cg_solve_kpap, cg_solve_lowmem


def _pick_cg(b: jax.Array):
    """Shape-gated solver choice: the fused low-memory CG above ~1 GB
    b-blocks (4 live [N, D] blocks vs the classic form's 5-6 — the
    difference between running and ResourceExhausted at 1M x 768 on one
    v5e), the classic form below (identical there; keeps small-N programs
    byte-for-byte unchanged)."""
    return cg_solve_lowmem if b.size * b.dtype.itemsize > LOWMEM_SOLVE_BYTES else cg_solve

__all__ = [
    "EnergyParams",
    "stationary_matvec",
    "solve_stationary",
    "settle_step",
    "query_rhs",
]


class EnergyParams(NamedTuple):
    """Dynamic energy coefficients (scalars, traced — never static)."""

    lamG: jax.Array
    lamC: jax.Array
    lamQ: jax.Array
    lamP: jax.Array

    @classmethod
    def make(cls, lamG: float, lamC: float, lamQ: float, lamP: float = 0.0):
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)  # noqa: E731
        return cls(f(lamG), f(lamC), f(lamQ), f(lamP))


def query_rhs(lam: EnergyParams, Y: jax.Array, psi: jax.Array, B: jax.Array):
    """RHS = lamG Y + lamQ (B ⊙ 1) psi^T (reference lattice.py:171, 245)."""
    return lam.lamG * Y + lam.lamQ * (B[:, None] * psi[None, :])


def stationary_matvec(
    g: Graph, pg: Optional[PathGraph], lam: EnergyParams, B: jax.Array, X: jax.Array
) -> jax.Array:
    """M X = lamG X + lamC L_sym X + lamQ B X (+ lamP L_path X)."""
    out = lam.lamG * X + lam.lamC * lap_matvec(g, X) + lam.lamQ * (B[:, None] * X)
    if pg is not None:
        out = out + lam.lamP * path_lap_matvec(pg, X)
    return out


def solve_stationary(
    g: Graph,
    pg: Optional[PathGraph],
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    tol=1e-4,
    max_iters=64,
    x0: Optional[jax.Array] = None,
):
    """Solve M U* = RHS with Jacobi CG, x0 = Y by default (lattice.py:232-263)."""
    rhs = query_rhs(lam, Y, psi, B)
    M_diag = lam.lamG + lam.lamQ * B
    if pg is not None:
        M_diag = M_diag + lam.lamP

    def M_mul(X):
        return stationary_matvec(g, pg, lam, B, X)

    return _pick_cg(rhs)(
        M_mul, rhs, x0=Y if x0 is None else x0, M_diag=M_diag, tol=tol, max_iters=max_iters
    )


_solve_stationary_chunk = jax.jit(solve_stationary)
"""Per-chunk stationary solve; module-level so the compile cache is reused
across solve_stationary_chunked calls (one trace per chunk shape)."""


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("off",))
def _write_cols(buf: jax.Array, chunk: jax.Array, off: int) -> jax.Array:
    """In-place (donated) column write.  The chunked solvers accumulate into
    one preallocated [N, D] buffer instead of list+concatenate — the latter
    keeps every chunk AND the full result alive simultaneously (an extra
    ~6 GB transient at N=1M, D=768 that OOM'd the chunked settle)."""
    return lax.dynamic_update_slice(buf, chunk, (0, off))


def _accumulate_chunks(n: int, d: int, chunks_iter):
    """Run per-chunk solves, writing each into a donated full-width buffer.

    ``chunks_iter`` yields (col_offset, (U_c, iters_c, res_c)); per-chunk
    sync serializes device work (concurrent chunk solves multiply peak
    memory — see solve_stationary_chunked)."""
    buf = jnp.zeros((n, d), dtype=jnp.float32)
    iters_all, res_all = [], []
    for off, (U_c, it_c, res_c) in chunks_iter:
        jax.block_until_ready(U_c)
        buf = _write_cols(buf, U_c, off)
        iters_all.append(it_c)
        res_all.append(res_c)
    return buf, jnp.max(jnp.stack(iters_all)), jnp.max(jnp.stack(res_all))


def solve_stationary_chunked(
    g,
    pg,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: "EnergyParams",
    tol=1e-4,
    max_iters=64,
    col_chunks: int = 2,
    x0: Optional[jax.Array] = None,
):
    """Stationary solve with the embedding columns split into chunks.

    CG over the [N, D] block is column-separable (per-column alpha/beta), so
    solving D/c columns at a time divides the solver working set by c — the
    knob that fits N=500k-1M, D=768 on one 16 GB chip (the full-width solve
    misses by ~31 MB at 500k, benchmarks/scale_tpu.json).  Termination is
    per-chunk max-column-norm, so per-chunk iteration counts may differ from
    the full-width solve by ±1 (all columns still reach ``tol``).

    This is a HOST-LEVEL loop over per-chunk jitted solves: placing all
    chunks inside one jit lets XLA schedule the independent chunk solves
    concurrently, multiplying peak memory (observed OOM at N=1M) — separate
    dispatches serialize them.  Do not wrap this function in jax.jit.

    Returns (Ustar [N, D], max iters across chunks, max residual).
    """
    n, d = Y.shape
    if d % col_chunks != 0:
        raise ValueError(f"D={d} must divide col_chunks={col_chunks}")
    w = d // col_chunks

    def chunks():
        for c in range(col_chunks):
            sl = slice(c * w, (c + 1) * w)
            # module-level jit: graph/params are traced arguments (not
            # baked-in constants), so the shape-keyed compile cache is
            # shared across calls
            yield c * w, _solve_stationary_chunk(
                g, pg, Y[:, sl], psi[sl], B, lam, tol, max_iters,
                None if x0 is None else x0[:, sl],
            )

    return _accumulate_chunks(n, d, chunks())


solve_stationary_donated = jax.jit(
    solve_stationary,
    donate_argnums=(2,),  # Y: consumed by rhs + x0 init, then dead — donating
    # it frees N*D*4 bytes mid-CG (the 43 MB margin that OOMs N=500k, D=768
    # on one v5e chip; benchmarks/scale_tpu.json)
    static_argnames=(),
)
"""Stationary solve that donates the anchors buffer (single-shot use only:
the caller's Y is invalidated)."""


def settle_step(
    g: Graph,
    pg: Optional[PathGraph],
    U: jax.Array,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    dt=1.0,
    tol=1e-3,
    max_iters=12,
    x0: Optional[jax.Array] = None,
    use_jacobi: bool = True,
):
    """One implicit Euler step (I + dt M) U+ = U + dt RHS (lattice.py:159-205)."""
    dt = jnp.asarray(dt, dtype=jnp.float32)
    rhs = U + dt * query_rhs(lam, Y, psi, B)

    def A_mul(X):
        return X + dt * stationary_matvec(g, pg, lam, B, X)

    M_diag = None
    if use_jacobi:
        diag_base = lam.lamG + lam.lamQ * B
        if pg is not None:
            diag_base = diag_base + lam.lamP
        M_diag = 1.0 + dt * diag_base

    return _pick_cg(rhs)(
        A_mul, rhs, x0=U if x0 is None else x0, M_diag=M_diag, tol=tol, max_iters=max_iters
    )


_settle_step_chunk = jax.jit(settle_step, static_argnames=("use_jacobi",))
"""Per-column-chunk settle step; module-level so the compile cache is shared."""


def settle_step_chunked(
    g: Graph,
    pg: Optional[PathGraph],
    U: jax.Array,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    dt=1.0,
    tol=1e-3,
    max_iters=12,
    x0: Optional[jax.Array] = None,
    use_jacobi: bool = True,
    col_chunks: int = 2,
    donate_u: bool = False,
):
    """Implicit Euler step with the embedding columns split into chunks —
    the settle analog of `solve_stationary_chunked` for the N=500k-1M
    single-chip regime (the full-width settle's CG state + gather temps
    exceed HBM there).  Host loop with per-chunk sync; do not jit.

    ``donate_u=True`` reuses U's buffer as the result accumulator — safe
    because chunk c reads only its own columns of U before they are
    overwritten, and column segments are disjoint.  The CALLER's U array is
    invalidated; only pass it when U is being replaced by the result (and
    no other live reference to it exists)."""
    n, d = Y.shape
    if d % col_chunks != 0:
        raise ValueError(f"D={d} must divide col_chunks={col_chunks}")
    w = d // col_chunks

    if donate_u and x0 is U:
        # x0 aliases the donated buffer; settle_step's default (x0 = its U
        # input) is the same start vector and stays valid across writes
        x0 = None
    buf = U if donate_u else jnp.zeros((n, d), dtype=jnp.float32)
    iters_all, res_all = [], []
    for c in range(col_chunks):
        sl = slice(c * w, (c + 1) * w)
        # with donation, chunk c's columns in buf still hold the original U
        # values (writes so far touched earlier columns only)
        src = buf if donate_u else U
        U_c, it_c, res_c = _settle_step_chunk(
            g, pg, src[:, sl], Y[:, sl], psi[sl], B, lam, dt, tol,
            max_iters, None if x0 is None else x0[:, sl], use_jacobi,
        )
        jax.block_until_ready(U_c)
        buf = _write_cols(buf, U_c, c * w)
        iters_all.append(it_c)
        res_all.append(res_c)
    return buf, jnp.max(jnp.stack(iters_all)), jnp.max(jnp.stack(res_all))


# -- windowed-matvec solves (contiguous-DMA Pallas kernel) ------------------
#
# For large lattices on locality-ordered data the Laplacian matvec runs
# through ops.pallas.window_spmv instead of the XLA gather path (see that
# module's header for the measured cost model).  The solve permutes rows into
# the plan's locality order, pads to the plan geometry, runs CG entirely in
# permuted space (padded rows carry decoupled lamG-only equations), and
# un-permutes the solution — two extra N-row gathers per solve, amortized
# over all CG iterations.


class WindowCtx(NamedTuple):
    """Locality-ordered window-matvec context (pytree of arrays)."""

    plan: "WindowPlan"  # ops.pallas.window_spmv.WindowPlan
    oh: jax.Array  # [Npad, 2W] one-hot weights (built once per graph)
    order: jax.Array  # [N] int32: permuted position -> original row
    inv_order: jax.Array  # [N] int32: original row -> permuted position


def _permuted_operands(ctx: WindowCtx, arrays):
    from ..ops.pallas.window_spmv import pad_rows

    n_pad = ctx.plan.n_pad
    return [pad_rows(jnp.take(a, ctx.order, axis=0), n_pad) for a in arrays]


def solve_stationary_windowed(
    ctx: WindowCtx,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    tol=1e-4,
    max_iters=64,
    x0: Optional[jax.Array] = None,
):
    """Stationary solve with the windowed Laplacian matvec (no chain prior)."""
    from ..ops.pallas.window_spmv import lap_matvec_windowed

    n = Y.shape[0]
    ops = [Y, B[:, None]] + ([x0] if x0 is not None else [])
    perm = _permuted_operands(ctx, ops)
    Yp, Bp = perm[0], perm[1][:, 0]
    x0p = perm[2] if x0 is not None else Yp
    rhs = lam.lamG * Yp + lam.lamQ * (Bp[:, None] * psi[None, :])
    M_diag = lam.lamG + lam.lamQ * Bp

    def M_mul(X):
        return (
            lam.lamG * X
            + lam.lamC * lap_matvec_windowed(ctx.plan, ctx.oh, X)
            + lam.lamQ * (Bp[:, None] * X)
        )

    Up, iters, res = cg_solve(
        M_mul, rhs, x0=x0p, M_diag=M_diag, tol=tol, max_iters=max_iters
    )
    return jnp.take(Up, ctx.inv_order, axis=0), iters, res


def solve_stationary_windowed_fused(
    ctx: WindowCtx,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    tol=1e-4,
    max_iters=64,
    x0: Optional[jax.Array] = None,
):
    """Stationary solve via the fused windowed operator (λ_C ≠ 0 required;
    the lattice router enforces it host-side).

    One kernel launch per CG iteration computes M p / λ_C AND ⟨p, Mp⟩/λ_C
    in the same pass (`k_matvec_windowed`), eliminating the separate
    elementwise λ-combine pass (3 [N, D] blocks of HBM traffic per apply)
    and the denominator reduction pass (2 blocks per iteration) of the
    unfused form.  Same CG contract; same permuted-space layout as
    `solve_stationary_windowed`."""
    from ..ops.pallas.window_spmv import k_matvec_windowed

    ops = [Y, B[:, None]] + ([x0] if x0 is not None else [])
    perm = _permuted_operands(ctx, ops)
    Yp, Bp = perm[0], perm[1][:, 0]
    x0p = perm[2] if x0 is not None else Yp
    rhs = lam.lamG * Yp + lam.lamQ * (Bp[:, None] * psi[None, :])
    M_diag = lam.lamG + lam.lamQ * Bp
    s = lam.lamC
    g = ((lam.lamG + lam.lamC + lam.lamQ * Bp) / s)[:, None]

    def K_mul(X):
        return k_matvec_windowed(ctx.plan, ctx.oh, X, g)

    Up, iters, res = cg_solve_kpap(
        K_mul, s, rhs, x0=x0p, M_diag=M_diag, tol=tol, max_iters=max_iters
    )
    return jnp.take(Up, ctx.inv_order, axis=0), iters, res


def settle_step_windowed_fused(
    ctx: WindowCtx,
    U: jax.Array,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    dt=1.0,
    tol=1e-3,
    max_iters=12,
    x0: Optional[jax.Array] = None,
    use_jacobi: bool = True,
):
    """Implicit Euler step via the fused windowed operator (requires
    dt·λ_C ≠ 0, enforced by the lattice router): A = I + dt·M = s·K with
    s = dt·λ_C and diag folded into the kernel's g."""
    from ..ops.pallas.window_spmv import k_matvec_windowed

    dt = jnp.asarray(dt, dtype=jnp.float32)
    ops = [U, Y, B[:, None]] + ([x0] if x0 is not None else [])
    perm = _permuted_operands(ctx, ops)
    Up0, Yp, Bp = perm[0], perm[1], perm[2][:, 0]
    x0p = perm[3] if x0 is not None else Up0
    rhs = Up0 + dt * (lam.lamG * Yp + lam.lamQ * (Bp[:, None] * psi[None, :]))
    s = dt * lam.lamC
    g = ((1.0 + dt * (lam.lamG + lam.lamQ * Bp) + dt * lam.lamC) / s)[:, None]
    M_diag = 1.0 + dt * (lam.lamG + lam.lamQ * Bp) if use_jacobi else None

    def K_mul(X):
        return k_matvec_windowed(ctx.plan, ctx.oh, X, g)

    Up, iters, res = cg_solve_kpap(
        K_mul, s, rhs, x0=x0p, M_diag=M_diag, tol=tol, max_iters=max_iters
    )
    return jnp.take(Up, ctx.inv_order, axis=0), iters, res


_solve_windowed_chunk = jax.jit(solve_stationary_windowed)
"""Per-column-chunk windowed solve; module-level so the shape-keyed compile
cache is shared across chunks and calls."""

_solve_windowed_fused_chunk = jax.jit(solve_stationary_windowed_fused)


def solve_stationary_windowed_chunked(
    ctx: WindowCtx,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    tol=1e-4,
    max_iters=64,
    col_chunks: int = 2,
    x0: Optional[jax.Array] = None,
    fused: bool = False,
):
    """Column-chunked windowed stationary solve for the N=500k-1M single-chip
    regime.  Unlike the XLA-gather chunked solve, the windowed matvec never
    materializes a [N, K, D_c] gather temp, so each chunk's working set is
    just the CG state blocks + the (D-independent) one-hot operands.  Host
    loop with per-chunk sync — same serialization rationale as
    `solve_stationary_chunked`; do not wrap in jax.jit."""
    n, d = Y.shape
    if d % col_chunks != 0:
        raise ValueError(f"D={d} must divide col_chunks={col_chunks}")
    w = d // col_chunks

    solve = _solve_windowed_fused_chunk if fused else _solve_windowed_chunk

    def chunks():
        for c in range(col_chunks):
            sl = slice(c * w, (c + 1) * w)
            yield c * w, solve(
                ctx, Y[:, sl], psi[sl], B, lam, tol, max_iters,
                None if x0 is None else x0[:, sl],
            )

    return _accumulate_chunks(n, d, chunks())


def settle_step_windowed(
    ctx: WindowCtx,
    U: jax.Array,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    dt=1.0,
    tol=1e-3,
    max_iters=12,
    x0: Optional[jax.Array] = None,
    use_jacobi: bool = True,
):
    """Implicit Euler step with the windowed Laplacian matvec (no chain)."""
    from ..ops.pallas.window_spmv import lap_matvec_windowed

    dt = jnp.asarray(dt, dtype=jnp.float32)
    ops = [U, Y, B[:, None]] + ([x0] if x0 is not None else [])
    perm = _permuted_operands(ctx, ops)
    Up0, Yp, Bp = perm[0], perm[1], perm[2][:, 0]
    x0p = perm[3] if x0 is not None else Up0
    rhs = Up0 + dt * (lam.lamG * Yp + lam.lamQ * (Bp[:, None] * psi[None, :]))

    def A_mul(X):
        return X + dt * (
            lam.lamG * X
            + lam.lamC * lap_matvec_windowed(ctx.plan, ctx.oh, X)
            + lam.lamQ * (Bp[:, None] * X)
        )

    M_diag = 1.0 + dt * (lam.lamG + lam.lamQ * Bp) if use_jacobi else None
    Up, iters, res = cg_solve(
        A_mul, rhs, x0=x0p, M_diag=M_diag, tol=tol, max_iters=max_iters
    )
    return jnp.take(Up, ctx.inv_order, axis=0), iters, res


_settle_windowed_chunk = jax.jit(
    settle_step_windowed, static_argnames=("use_jacobi",)
)

_settle_windowed_fused_chunk = jax.jit(
    settle_step_windowed_fused, static_argnames=("use_jacobi",)
)


def settle_step_windowed_chunked(
    ctx: WindowCtx,
    U: jax.Array,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    dt=1.0,
    tol=1e-3,
    max_iters=12,
    x0: Optional[jax.Array] = None,
    use_jacobi: bool = True,
    col_chunks: int = 2,
    fused: bool = False,
):
    """Column-chunked windowed settle for the large-N regime: the windowed
    analog of `settle_step_chunked` (no gather temps; same host-loop
    serialization rationale — do not jit)."""
    n, d = Y.shape
    if d % col_chunks != 0:
        raise ValueError(f"D={d} must divide col_chunks={col_chunks}")
    w = d // col_chunks
    settle = _settle_windowed_fused_chunk if fused else _settle_windowed_chunk

    def chunks():
        for c in range(col_chunks):
            sl = slice(c * w, (c + 1) * w)
            yield c * w, settle(
                ctx, U[:, sl], Y[:, sl], psi[sl], B, lam, dt, tol, max_iters,
                None if x0 is None else x0[:, sl], use_jacobi,
            )

    return _accumulate_chunks(n, d, chunks())
