"""Explicit-collective row-sharded CG via shard_map.

Where `parallel.sharded` lets GSPMD partition the program automatically,
this module writes the SPMD program explicitly: each device owns a
contiguous row block of Y/U/B and its graph rows (global neighbor ids), and
every CG iteration performs

  1. `lax.all_gather` of the search direction over the `rows` axis (the
     neighbor gather needs arbitrary remote rows — mutual-kNN on unordered
     data has no locality, so the halo is effectively the full row set;
     locality-restricted halo exchange needs graph-partition reordering,
     which is the documented roadmap),
  2. the local gather-SpMV over the device's rows,
  3. `lax.psum` for the per-column alpha/beta dot products and the residual
     column norms.

The collective ORDER is fixed by construction, so cross-topology receipt
determinism is explicit rather than inherited from GSPMD's scheduler.
Numerically this matches the reference CG contract (epsilons, >= 1
iteration, max-column-norm termination).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.coherence import EnergyParams
from ..ops.graph import Graph

__all__ = ["shardmap_solve"]


def _local_lap_matvec(idx, wn, X_full, X_local):
    """(L_sym X) for this shard's rows; idx holds GLOBAL row ids."""
    acc = X_local
    for a in range(idx.shape[1]):
        nbr = jnp.take(X_full, idx[:, a], axis=0)
        acc = acc - wn[:, a][:, None] * nbr
    return acc


def shardmap_solve(
    mesh: Mesh,
    g: Graph,
    Y: jax.Array,
    psi: jax.Array,
    B: jax.Array,
    lam: EnergyParams,
    tol: float = 1e-4,
    max_iters: int = 64,
    axis_name: str = "rows",
):
    """Stationary solve M U* = lamG Y + lamQ B psi^T with explicit collectives.

    Y/B and the graph rows are sharded by rows over ``mesh``; psi replicated.
    Returns (Ustar, iters, res) with Ustar row-sharded.
    """
    n = Y.shape[0]
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"N={n} is not divisible by mesh size {n_dev}")

    row = NamedSharding(mesh, P(axis_name, None))
    vec = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    Y = jax.device_put(Y, row)
    B = jax.device_put(B, vec)
    psi = jax.device_put(psi, repl)
    idx = jax.device_put(g.idx, row)
    wn = jax.device_put(g.wn, row)

    return _shardmap_solve_fn(mesh, axis_name)(
        Y, B, psi, idx, wn, lam, jnp.float32(tol), jnp.int32(max_iters)
    )


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=8)
def _shardmap_solve_fn(mesh: Mesh, axis_name: str):
    """Jitted multi-device solve, cached per (mesh, axis_name): building the
    closure inside every shardmap_solve call re-traced and re-compiled the
    whole multi-device CG per request.  lam/tol/max_iters are traced
    arguments so parameter retuning never recompiles (the repo contract)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(axis_name, None),  # Y
            P(axis_name),  # B
            P(),  # psi
            P(axis_name, None),  # idx
            P(axis_name, None),  # wn
            P(),  # lam (pytree prefix: every leaf replicated)
            P(),  # tol
            P(),  # max_iters
        ),
        out_specs=(P(axis_name, None), P(), P()),
    )
    def solve(Y_l, B_l, psi_r, idx_l, wn_l, lam, tol_a, max_iters_a):
        def M_mul(p_l):
            # all-gather the direction so the neighbor gather sees all rows
            p_full = lax.all_gather(p_l, axis_name, axis=0, tiled=True)
            lap = _local_lap_matvec(idx_l, wn_l, p_full, p_l)
            return lam.lamG * p_l + lam.lamC * lap + lam.lamQ * (B_l[:, None] * p_l)

        rhs = lam.lamG * Y_l + lam.lamQ * (B_l[:, None] * psi_r[None, :])
        M_diag = lam.lamG + lam.lamQ * B_l
        inv_M = 1.0 / (M_diag[:, None] + 1e-12)

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
            col_sq = lax.psum(jnp.sum(r * r, axis=0), axis_name)
            res = jnp.sqrt(jnp.max(col_sq))
            z = r * inv_M
            rz_new = lax.psum(jnp.sum(r * z, axis=0), axis_name)
            beta = rz_new / (rz + 1e-18)
            p = z + p * beta
            return (x, r, p, rz_new, it + 1, res)

        init = (x, r, p, rz, jnp.int32(0), jnp.float32(jnp.inf))
        x, _, _, _, it, res = lax.while_loop(cond, body, init)
        return x, it, res

    return jax.jit(solve)
