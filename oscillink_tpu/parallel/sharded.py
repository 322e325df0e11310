"""Row-sharded lattice build + settle over a device mesh (GSPMD).

The full pipeline — blocked similarity top-k, mutual mask, row cap, implicit
Euler CG settle, deltaH receipt — is jitted once with `NamedSharding`
annotations: Y / U / gates row-block-sharded over the ``rows`` mesh axis, psi
and scalars replicated.  XLA GSPMD partitions the similarity matmul, turns
the neighbor gathers into halo collectives, and lowers CG's dot products to
ICI all-reduces (the scaling-book recipe: annotate shardings, let XLA insert
collectives).

This is the correctness-first scale-out path; a shard_map + Pallas halo
pipeline for N≈1M rows lands on top of the same mesh contract.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.coherence import EnergyParams, settle_step, solve_stationary
from ..ops.graph import build_graph
from ..ops.receipts import deltaH_trace

__all__ = ["sharded_settle_fn", "sharded_build_and_settle"]


@partial(jax.jit, static_argnames=("k",))
def _build_settle_receipt(Y, psi, B, lam, k, dt, tol, max_iters):
    """Full lattice step: graph build -> settle -> stationary solve -> deltaH."""
    g = build_graph(Y, k)
    U_plus, it_s, res_s = settle_step(
        g, None, Y, Y, psi, B, lam, dt=dt, tol=tol, max_iters=max_iters
    )
    Ustar, it_u, res_u = solve_stationary(g, None, Y, psi, B, lam, tol=tol, max_iters=max_iters)
    dH = deltaH_trace(g, None, U_plus, Ustar, lam, B)
    return U_plus, Ustar, dH, it_s, res_s, it_u, res_u


def sharded_settle_fn(mesh: Mesh, k: int, axis_name: str = "rows"):
    """Return a compiled callable (Y, psi, B, lam, dt, tol, max_iters) with
    rows sharded over ``mesh``; call it with replicated host arrays."""
    row_sharded = NamedSharding(mesh, P(axis_name, None))
    row_vec = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def fn(Y, psi, B, lam, dt, tol, max_iters):
        Y = jax.device_put(Y, row_sharded)
        psi = jax.device_put(psi, repl)
        B = jax.device_put(B, row_vec)
        return _build_settle_receipt(Y, psi, B, lam, k, dt, tol, max_iters)

    return fn


def sharded_build_and_settle(
    Y,
    psi,
    B=None,
    *,
    k: int = 6,
    lamG: float = 1.0,
    lamC: float = 0.5,
    lamQ: float = 4.0,
    dt: float = 1.0,
    tol: float = 1e-3,
    max_iters: int = 12,
    mesh: Optional[Mesh] = None,
    axis_name: str = "rows",
):
    """One-call sharded build + settle + receipt over ``mesh`` (or all devices).

    Returns dict with U (settled), Ustar, deltaH, and CG diagnostics.
    """
    from .mesh import lattice_mesh

    if mesh is None:
        mesh = lattice_mesh(axis_name=axis_name)
    Y = jnp.asarray(Y, dtype=jnp.float32)
    psi = jnp.asarray(psi, dtype=jnp.float32)
    n = Y.shape[0]
    if B is None:
        B = jnp.ones(n, dtype=jnp.float32)
    else:
        B = jnp.asarray(B, dtype=jnp.float32)
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"N={n} must be divisible by mesh size {n_dev}")

    lam = EnergyParams.make(lamG, lamC, lamQ, 0.0)
    k = min(int(k), max(1, n - 1))  # build_graph precondition (graph.py)
    fn = sharded_settle_fn(mesh, k, axis_name)
    U, Ustar, dH, it_s, res_s, it_u, res_u = fn(
        Y, psi, B, lam, jnp.float32(dt), jnp.float32(tol), jnp.int32(max_iters)
    )
    return {
        "U": U,
        "Ustar": Ustar,
        "deltaH": float(dH),
        "settle_iters": int(it_s),
        "settle_res": float(res_s),
        "ustar_iters": int(it_u),
        "ustar_res": float(res_u),
        "mesh_devices": int(n_dev),
    }
