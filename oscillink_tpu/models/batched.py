"""Batched multi-query solves: one graph, many queries (the DP analog).

The serving pattern the reference can't express (SURVEY.md §2.7: "batched
lattices vmapped across devices"): a corpus is settled against Q queries at
once.  The graph build — the expensive part — is shared; `vmap` maps the
stationary solve over the query axis, so the MXU sees [Q, N, D]-shaped work
and the per-query marginal cost collapses.

Semantics per query are identical to `solve_stationary`; CG termination is
per-query (each vmapped lane runs its own while_loop trip count).
"""

from __future__ import annotations

from functools import partial

import jax

from ..ops.graph import Graph
from .coherence import EnergyParams, solve_stationary

__all__ = ["solve_stationary_batch", "bundle_scores_batch"]


@partial(jax.jit, static_argnames=())
def solve_stationary_batch(
    g: Graph,
    Y: jax.Array,
    psis: jax.Array,  # [Q, D]
    Bs: jax.Array,  # [Q, N]
    lam: EnergyParams,
    tol=1e-4,
    max_iters=64,
):
    """U* for Q queries over one shared graph. Returns ([Q,N,D], [Q], [Q])."""

    def one(psi, B):
        return solve_stationary(g, None, Y, psi, B, lam, tol=tol, max_iters=max_iters)

    return jax.vmap(one)(psis, Bs)


@partial(jax.jit, static_argnames=("k",))
def settle_lattice_batch(
    Ys: jax.Array,  # [B, N, D] — a batch of same-shape corpora
    psis: jax.Array,  # [B, D]
    Bs: jax.Array,  # [B, N]
    lam: EnergyParams,
    k: int,
    dt=1.0,
    tol=1e-3,
    max_iters=12,
):
    """Batch-of-lattices (the DP analog, SURVEY.md §2.7): vmap the FULL
    pipeline — graph build + implicit-Euler settle — over a batch of
    independent same-shape corpora.  Returns (U+ [B,N,D], iters [B], res [B]).

    Note on termination under vmap: the batched while_loop iterates until
    EVERY lane converges, so early-converging lanes run extra CG iterations —
    which only tightens them further toward the same stationary point (they
    end at <= tol, typically below it).
    """
    from ..ops.graph import build_graph
    from .coherence import settle_step

    def one(Y, psi, B):
        g = build_graph(Y, k)
        return settle_step(
            g, None, Y, Y, psi, B, lam, dt=dt, tol=tol, max_iters=max_iters
        )

    return jax.vmap(one)(Ys, psis, Bs)


@jax.jit
def bundle_scores_batch(
    g: Graph,
    Y: jax.Array,
    Ustars: jax.Array,  # [Q, N, D]
    psis: jax.Array,  # [Q, D]
    lamC,
    alpha,
):
    """Per-query bundle scores/alignment over the shared graph."""
    from ..ops.receipts import bundle_scores

    def one(Ustar, psi):
        return bundle_scores(g, Y, Ustar, psi, lamC, alpha)

    return jax.vmap(one)(Ustars, psis)
