"""Fused one-shot settle+receipt: the whole pipeline in ONE device program.

The incremental lattice API (construct -> set_query -> settle -> receipt)
issues several device dispatches and one batched device->host fetch; through
a tunneled runtime the fetch RPC alone costs ~25-50 ms — more than the whole
N~1200 computation (reference headline config, README.md:174-184).  Serving
traffic is one-shot by nature (a /v1/settle request carries Y + psi + params
and wants scalars back), so this module compiles the FULL pipeline

    mutual-kNN graph build -> implicit-Euler settle -> stationary solve
    -> deltaH trace (light receipt)

into a single jitted program whose output is one small scalar pack: one
dispatch, one tiny fetch.  (Reference pipeline being fused:
oscillink/core/lattice.py:33-110, 159-230, 232-290, 298-332.)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph import build_graph
from ..ops.receipts import deltaH_trace
from .coherence import EnergyParams, settle_step, solve_stationary

__all__ = ["fused_settle_receipt", "settle_receipt_light"]


@partial(jax.jit, static_argnames=("k",))
def fused_settle_receipt(Y, psi, B, lam: EnergyParams, opts, k: int):
    """One-program pipeline. ``opts`` packs
    [row_cap, dt, settle_tol, settle_iters, ustar_tol, ustar_iters].

    Returns (U_plus, Ustar, scalar_pack) where scalar_pack is
    [deltaH, settle_iters, settle_res, ustar_iters, ustar_res, n_edges].
    Only the scalar pack needs fetching for a light receipt; U stays on
    device unless explicitly exported.
    """
    row_cap, dt = opts[0], opts[1]
    s_tol, s_it = opts[2], opts[3].astype(jnp.int32)
    u_tol, u_it = opts[4], opts[5].astype(jnp.int32)

    g = build_graph(Y, k, row_cap=row_cap)
    U_plus, s_iters, s_res = settle_step(
        g, None, Y, Y, psi, B, lam, dt=dt, tol=s_tol, max_iters=s_it
    )
    Ustar, u_iters, u_res = solve_stationary(
        g, None, Y, psi, B, lam, tol=u_tol, max_iters=u_it
    )
    dH = deltaH_trace(g, None, U_plus, Ustar, lam, B)
    n_edges = jnp.sum((g.w > 0).astype(jnp.int32)) // 2
    pack = jnp.stack(
        [
            dH,
            s_iters.astype(jnp.float32),
            s_res,
            u_iters.astype(jnp.float32),
            u_res,
            n_edges.astype(jnp.float32),
        ]
    )
    return U_plus, Ustar, pack


def settle_receipt_light(
    Y: np.ndarray,
    psi: np.ndarray,
    *,
    kneighbors: int = 6,
    gates: Optional[np.ndarray] = None,
    lamG: float = 1.0,
    lamC: float = 0.5,
    lamQ: float = 4.0,
    row_cap: float = 1.0,
    dt: float = 1.0,
    settle_tol: float = 1e-3,
    settle_max_iters: int = 12,
    ustar_tol: float = 1e-4,
    ustar_max_iters: int = 64,
) -> dict[str, Any]:
    """Host-facing one-shot: returns the light-receipt scalars as a dict.

    Exactly one device->host fetch (the 6-scalar pack); the settled state and
    U* never leave the device.
    """
    Yd = jnp.asarray(np.asarray(Y, dtype=np.float32))
    psid = jnp.asarray(np.asarray(psi, dtype=np.float32))
    n = Yd.shape[0]
    Bd = (
        jnp.asarray(np.clip(np.asarray(gates, dtype=np.float32), 0.0, 1.0))
        if gates is not None
        else jnp.ones(n, dtype=jnp.float32)
    )
    k = min(kneighbors, max(1, n - 1))
    lam = EnergyParams.make(lamG, lamC, lamQ, 0.0)
    opts = jnp.asarray(
        np.array(
            [row_cap, dt, settle_tol, settle_max_iters, ustar_tol, ustar_max_iters],
            dtype=np.float32,
        )
    )
    _, _, pack = fused_settle_receipt(Yd, psid, Bd, lam, opts, k)
    vals = np.asarray(jax.device_get(pack))
    return {
        "deltaH_total": float(vals[0]),
        "settle_iters": int(vals[1]),
        "settle_res": float(vals[2]),
        "ustar_iters": int(vals[3]),
        "ustar_res": float(vals[4]),
        "edge_count": int(vals[5]),
    }
