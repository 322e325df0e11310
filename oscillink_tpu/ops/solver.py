"""Jacobi-preconditioned multi-RHS conjugate gradient, jit/while_loop form.

Behavioral contract (reference: oscillink/core/solver.py:6-37): operates on a
linear operator ``A_mul`` over [N, D] blocks; per-column alpha/beta; residual
is the max column L2 norm; epsilon guards 1e-18 (denominators) and 1e-12
(preconditioner diagonal); ALWAYS runs at least one iteration; returns
(x, iters, res) where res is the residual at exit.

TPU-first: a single `lax.while_loop` whose body is one operator application
(the gather-SpMV Laplacian matvec) plus two axis-0 reductions — everything
fuses under XLA; `tol` and `max_iters` are dynamic so retuning never
recompiles.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["cg_solve", "cg_solve_kpap", "cg_solve_lowmem", "LOWMEM_SOLVE_BYTES"]

# Above this b-block size the coherence solves route to cg_solve_lowmem
# (models/coherence.py): at N=1M x 768 the classic form's live set
# (x, r, p, z, Ap — 5-6 [N, D] blocks) exceeds the 16 GB chip and
# ResourceExhausted's, while the fused form's 4 blocks fit
# (benchmarks/probe_lowmem3.py).
LOWMEM_SOLVE_BYTES = 1_000_000_000


def cg_solve(
    A_mul: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    M_diag: Optional[jax.Array] = None,
    tol: float | jax.Array = 1e-3,
    max_iters: int | jax.Array = 100,
):
    """CG for an SPD operator; multi-RHS [N, D]. Returns (x, iters, res).

    ``M_diag`` is the Jacobi preconditioner diagonal ([N]) or None.
    """
    if b.ndim == 1:
        b2 = b[:, None]
    else:
        b2 = b
    x = jnp.zeros_like(b2) if x0 is None else x0.reshape(b2.shape).astype(b2.dtype)

    if M_diag is not None:
        inv_M = 1.0 / (M_diag[:, None] + 1e-12)

        def precond(r):
            return r * inv_M
    else:

        def precond(r):
            return r

    tol = jnp.asarray(tol, dtype=jnp.float32)
    max_iters = jnp.asarray(max_iters, dtype=jnp.int32)

    r = b2 - A_mul(x)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z, axis=0)

    def cond_fn(carry):
        _, _, _, _, it, res = carry
        # the reference's for-loop always performs >= 1 iteration
        return (it == 0) | ((it < max_iters) & (res > tol))

    def body_fn(carry):
        x, r, p, rz, it, _ = carry
        Ap = A_mul(p)
        denom = jnp.sum(p * Ap, axis=0) + 1e-18
        alpha = rz / denom
        x = x + p * alpha
        r = r - Ap * alpha
        res = jnp.max(jnp.linalg.norm(r, axis=0))
        z = precond(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = rz_new / (rz + 1e-18)
        p = z + p * beta
        return (x, r, p, rz_new, it + 1, res)

    init = (x, r, p, rz, jnp.int32(0), jnp.float32(jnp.inf))
    x, _, _, _, iters, res = lax.while_loop(cond_fn, body_fn, init)
    if b.ndim == 1:
        x = x[:, 0]
    return x, iters, res


def cg_solve_kpap(
    K_mul: Callable[[jax.Array], tuple[jax.Array, jax.Array]],
    s: jax.Array,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    M_diag: Optional[jax.Array] = None,
    tol: float | jax.Array = 1e-3,
    max_iters: int | jax.Array = 100,
):
    """`cg_solve` for A = s·K where the operator returns its own denominator.

    ``K_mul(x)`` returns ``(K x, per-column Σ_rows x⊙Kx)`` — the fused
    windowed kernel (`ops.pallas.window_spmv.k_matvec_windowed`) computes
    the reduction while its output block is VMEM-resident, so the CG body
    never streams p and Ap again for ⟨p, Ap⟩.  Inside the loop the
    operator's scale s is applied to the SCALARS (alpha·s on the residual
    update, s·⟨p,Kp⟩ on the denominator), never to the [N, D] blocks:
    r − α·(s·Kp) ≡ r − (α·s)·Kp.  (The one-time initial residual is the
    exception: r₀ = b − (Kx₀)·s touches the block once — unavoidable and
    outside the loop.)  Same epsilon/≥1-iteration/max-col-norm contract as
    `cg_solve`; ``b`` must be 2-D [N, D].  Requires s ≠ 0 (the host-side
    router falls back to `cg_solve` when λ_C or dt is 0)."""
    x = jnp.zeros_like(b) if x0 is None else x0.reshape(b.shape).astype(b.dtype)

    if M_diag is not None:
        inv_M = 1.0 / (M_diag[:, None] + 1e-12)

        def precond(r):
            return r * inv_M
    else:

        def precond(r):
            return r

    s = jnp.asarray(s, dtype=jnp.float32)
    tol = jnp.asarray(tol, dtype=jnp.float32)
    max_iters = jnp.asarray(max_iters, dtype=jnp.int32)

    Kx, _ = K_mul(x)
    r = b - Kx * s
    z = precond(r)
    p = z
    rz = jnp.sum(r * z, axis=0)

    def cond_fn(carry):
        _, _, _, _, it, res = carry
        return (it == 0) | ((it < max_iters) & (res > tol))

    def body_fn(carry):
        x, r, p, rz, it, _ = carry
        Kp, pkp = K_mul(p)
        denom = s * pkp + 1e-18
        alpha = rz / denom
        x = x + p * alpha
        r = r - Kp * (alpha * s)
        res = jnp.max(jnp.linalg.norm(r, axis=0))
        z = precond(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = rz_new / (rz + 1e-18)
        p = z + p * beta
        return (x, r, p, rz_new, it + 1, res)

    init = (x, r, p, rz, jnp.int32(0), jnp.float32(jnp.inf))
    x, _, _, _, iters, res = lax.while_loop(cond_fn, body_fn, init)
    return x, iters, res


def cg_solve_lowmem(
    A_mul: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    M_diag: Optional[jax.Array] = None,
    tol: float | jax.Array = 1e-3,
    max_iters: int | jax.Array = 100,
):
    """`cg_solve` with the minimum large-N live set: 4 [N, D] blocks.

    Same contract and float-identical update expressions as `cg_solve` —
    the preconditioned residual z = r * inv_M is just never a named value:
    the Jacobi multiply is written inline in the rz reduction
    (sum(r * (r * inv_M))) and the p update (r * inv_M + p * beta), so XLA
    fuses it into both consumers instead of materializing a fifth/sixth
    [N, D] block.  At N=1M, D=768 on one v5e the classic form
    ResourceExhausted's while this one runs (probe_lowmem3 vs probe_lowmem2
    cg5 — the probe this shape was validated by).  Use for b-blocks above
    `LOWMEM_SOLVE_BYTES`; below that the classic form is identical in both
    time and fit.
    """
    b2 = b[:, None] if b.ndim == 1 else b
    x = jnp.zeros_like(b2) if x0 is None else x0.reshape(b2.shape).astype(b2.dtype)

    if M_diag is not None:
        inv_M = 1.0 / (M_diag[:, None] + 1e-12)
    else:
        inv_M = None

    def _rz(r):
        return jnp.sum(r * (r * inv_M) if inv_M is not None else r * r, axis=0)

    def _p_from(r, p, beta):
        z = r * inv_M if inv_M is not None else r
        return z + p * beta

    tol = jnp.asarray(tol, dtype=jnp.float32)
    max_iters = jnp.asarray(max_iters, dtype=jnp.int32)

    r = b2 - A_mul(x)
    rz = _rz(r)
    p = r * inv_M if inv_M is not None else r

    def cond_fn(carry):
        _, _, _, _, it, res = carry
        return (it == 0) | ((it < max_iters) & (res > tol))

    def body_fn(carry):
        x, r, p, rz, it, _ = carry
        Ap = A_mul(p)
        denom = jnp.sum(p * Ap, axis=0) + 1e-18
        alpha = rz / denom
        x = x + p * alpha
        r = r - Ap * alpha
        res = jnp.max(jnp.linalg.norm(r, axis=0))
        rz_new = _rz(r)
        beta = rz_new / (rz + 1e-18)
        p = _p_from(r, p, beta)
        return (x, r, p, rz_new, it + 1, res)

    init = (x, r, p, rz, jnp.int32(0), jnp.float32(jnp.inf))
    x, _, _, _, iters, res = lax.while_loop(cond_fn, body_fn, init)
    if b.ndim == 1:
        x = x[:, 0]
    return x, iters, res
