"""Hierarchical lattice-of-lattices: the scale-out composition contract.

The reference ships this only as a design document (docs/guides/SCALING.md:
27-76, "Status: conceptual"): shard the anchors, settle each shard locally,
derive a summary embedding per shard, solve a super-lattice over summaries,
and compose receipts.  Here it is implemented TPU-first:

  * equal-size row shards; per-shard graph build + stationary solve runs as
    ONE lax.map'd jitted program (shards batch onto the device — or, over a
    mesh, shard-map to one device each so the local solves never leave ICI);
  * shard summaries are query-gate-weighted means of the settled rows;
  * the super-lattice runs the same coherence model over the S summary
    embeddings;
  * the composed receipt carries per-shard deltaH, the super-level deltaH,
    per-shard alignment, and a deterministic composition signature —
    fault-isolated per shard exactly as SCALING.md:71-76 prescribes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.coherence import EnergyParams, solve_stationary
from ..ops.graph import build_graph

__all__ = ["hierarchical_settle"]


def shard_solve_body(Y_s, psi, B_s, lam, k, tol, max_iters):
    """One shard's local solve — THE shared definition of the composition
    contract's per-shard receipt (graph build + stationary solve + energy
    drop proxy + gate-weighted summary + alignment).  Used by the batch
    tier's lax.map below and by the streaming tier's micro-solve
    (parallel/streaming.py), so the two tiers cannot drift apart."""
    g = build_graph(Y_s, k)
    Ustar, iters, res = solve_stationary(
        g, None, Y_s, psi, B_s, lam, tol=tol, max_iters=max_iters
    )
    diff = Ustar - Y_s
    # per-shard energy drop proxy: anchor displacement + query alignment
    dH = jnp.sum(diff * (lam.lamG * diff))
    # summary embedding: gate-weighted mean of settled rows
    wsum = jnp.sum(B_s) + 1e-12
    summary = jnp.sum(Ustar * B_s[:, None], axis=0) / wsum
    align = jnp.dot(
        summary / (jnp.linalg.norm(summary) + 1e-12),
        psi / (jnp.linalg.norm(psi) + 1e-12),
    )
    return Ustar, summary, dH, align, iters, res


@partial(jax.jit, static_argnames=("k",))
def _shard_solve(Y_shards, psi, B_shards, lam, k, tol, max_iters):
    """lax.map over [S, n_s, D] shards: build + stationary solve each."""

    def one(args):
        Y_s, B_s = args
        return shard_solve_body(Y_s, psi, B_s, lam, k, tol, max_iters)

    return jax.lax.map(one, (Y_shards, B_shards))


@partial(jax.jit, static_argnames=("k",))
def _super_solve(summaries, psi, lam, k, tol, max_iters):
    S = summaries.shape[0]
    B = jnp.ones(S, dtype=jnp.float32)
    g = build_graph(summaries, k)
    Ustar, iters, res = solve_stationary(
        g, None, summaries, psi, B, lam, tol=tol, max_iters=max_iters
    )
    # super-level energy drop, same proxy convention as the shard level
    # (the composed receipt contract promises it — module header)
    diff = Ustar - summaries
    dH = jnp.sum(diff * (lam.lamG * diff))
    u_n = Ustar / (jnp.linalg.norm(Ustar, axis=1, keepdims=True) + 1e-12)
    psi_n = psi / (jnp.linalg.norm(psi) + 1e-12)
    align = u_n @ psi_n
    return Ustar, align, dH, iters, res


def hierarchical_settle(
    Y: np.ndarray,
    psi: np.ndarray,
    gates: Optional[np.ndarray] = None,
    *,
    n_shards: int = 8,
    kneighbors: int = 6,
    super_k: int = 3,
    lamG: float = 1.0,
    lamC: float = 0.5,
    lamQ: float = 4.0,
    tol: float = 1e-4,
    max_iters: int = 64,
    receipt_secret: Optional[bytes | str] = None,
) -> dict[str, Any]:
    """Shard -> local settle -> summary super-lattice -> composed receipt.

    N must be divisible by ``n_shards`` (pad upstream).  Returns the composed
    receipt plus per-shard diagnostics and the settled U* per shard.  With
    ``receipt_secret``, every shard receipt and the composed receipt carry
    independently verifiable HMAC blocks (SCALING.md:71-76 fault-domain
    contract; `core.receipts.verify_component`).
    """
    Y = np.asarray(Y, dtype=np.float32)
    psi = np.asarray(psi, dtype=np.float32)
    n, d = Y.shape
    if n % n_shards != 0:
        raise ValueError(f"N={n} not divisible by n_shards={n_shards}")
    ns = n // n_shards
    gates = (
        np.ones(n, dtype=np.float32)
        if gates is None
        else np.asarray(gates, dtype=np.float32)
    )

    lam = EnergyParams.make(lamG, lamC, lamQ, 0.0)
    Y_shards = jnp.asarray(Y.reshape(n_shards, ns, d))
    B_shards = jnp.asarray(gates.astype(np.float32).reshape(n_shards, ns))
    psi_dev = jnp.asarray(psi)

    k_local = min(kneighbors, max(1, ns - 1))
    Ustars, summaries, dHs, aligns, iters_s, res_s = _shard_solve(
        Y_shards, psi_dev, B_shards, lam, k_local, jnp.float32(tol), jnp.int32(max_iters)
    )

    k_super = min(super_k, max(1, n_shards - 1))
    super_U, super_align, super_dH, s_iters, s_res = _super_solve(
        summaries, psi_dev, lam, k_super, jnp.float32(tol), jnp.int32(max_iters)
    )

    (dHs, aligns, iters_s, res_s, super_align, super_dH, s_iters, s_res) = (
        jax.device_get(
            (dHs, aligns, iters_s, res_s, super_align, super_dH, s_iters, s_res)
        )
    )

    shard_receipts = [
        {
            "shard": int(s),
            "deltaH": float(dHs[s]),
            "align": float(aligns[s]),
            "iters": int(iters_s[s]),
            "res": float(res_s[s]),
        }
        for s in range(n_shards)
    ]
    if receipt_secret is not None:
        from ..core.receipts import sign_component

        for r in shard_receipts:
            r["signature"] = sign_component(dict(r), receipt_secret)
    order = np.argsort(-np.asarray(super_align)).tolist()

    import hashlib
    import json

    comp_sig = hashlib.sha256(
        json.dumps(
            {
                "shards": n_shards,
                "deltaH": [round(float(x), 6) for x in dHs],
                "super_deltaH": round(float(super_dH), 6),
                "super_align": [round(float(x), 6) for x in super_align],
            },
            sort_keys=True,
        ).encode()
    ).hexdigest()

    out = {
        "n_shards": n_shards,
        "shard_receipts": shard_receipts,
        "deltaH_composed": float(np.sum(dHs)) + float(super_dH),
        "super": {
            "deltaH": float(super_dH),
            "align": [float(a) for a in super_align],
            "ranking": [int(i) for i in order],
            "iters": int(s_iters),
            "res": float(s_res),
        },
        "composition_sig": comp_sig,
        "Ustar_shards": Ustars,
        "summaries": summaries,
    }
    if receipt_secret is not None:
        from ..core.receipts import sign_component

        # sign every JSON-serializable field of the composed receipt
        # (tampering with an unsigned field — super ranking, shard list —
        # would otherwise pass verify_component); device arrays stay out
        out["signature"] = sign_component(
            {
                k: v
                for k, v in out.items()
                if k not in ("Ustar_shards", "summaries")
            },
            receipt_secret,
        )
    return out
