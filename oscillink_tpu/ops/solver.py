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

__all__ = ["cg_solve"]


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
