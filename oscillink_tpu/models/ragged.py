"""Ragged batch settle: many different-size corpora in one padded batch.

The service's batched path (`models.batched`) vmaps one corpus against many
queries; this module vmaps MANY corpora of different sizes by zero-padding
them to one bucket shape.  Zero rows are naturally isolated in the
mutual-kNN build — their similarities are 0, so every incident weight clips
to 0 (`graph_from_topk` w = max(vals, 0)) — which makes the padded build's
REAL subgraph bit-identical to each corpus's standalone build: padding can
displace only zero-weight (negative-similarity) top-k entries.

Receipt-exactness of the bundle requires masking the score statistics: the
reference's z-normalization (lattice.py:530-568) runs over the corpus's own
N rows, so mean/std here are computed over each lane's ``n_valid`` prefix
rather than the padded width.  Padded rows score -inf and can never be
selected by MMR.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.graph import build_graph, mmr_select, normalize_rows
from ..ops.receipts import coherence_drop
from .coherence import EnergyParams, settle_step, solve_stationary

__all__ = ["bundle_ragged"]

_BUCKET = 64  # pad corpora to a multiple of this (bounds compile shapes)


@partial(jax.jit, static_argnames=("k", "bundle_k"))
def _ragged_pipeline(
    Ys: jax.Array,  # [B, Npad, D] zero-padded corpora
    psis: jax.Array,  # [B, D]
    Bs: jax.Array,  # [B, Npad] gates (0 on padding)
    n_valids: jax.Array,  # [B] int32 true row counts
    lam: EnergyParams,
    k: int,
    bundle_k: int,
    alpha: jax.Array,
    dt: jax.Array,
    tol: jax.Array,
    max_iters: jax.Array,
):
    n_pad = Ys.shape[1]

    def one(Y, psi, B, n_valid):
        g = build_graph(Y, k)
        _, it_s, res_s = settle_step(
            g, None, Y, Y, psi, B, lam, dt=dt, tol=tol, max_iters=max_iters
        )
        Ustar, _, _ = solve_stationary(
            g, None, Y, psi, B, lam, tol=tol, max_iters=max_iters
        )
        valid = jnp.arange(n_pad) < n_valid
        nv = jnp.maximum(n_valid.astype(jnp.float32), 1.0)
        coh = jnp.where(valid, coherence_drop(g, Y, Ustar, lam.lamC), 0.0)
        mu = jnp.sum(coh) / nv
        sigma = jnp.sqrt(jnp.sum(jnp.where(valid, (coh - mu) ** 2, 0.0)) / nv) + 1e-12
        u_norm = jnp.linalg.norm(Ustar, axis=1, keepdims=True) + 1e-12
        psi_n = psi / (jnp.linalg.norm(psi) + 1e-12)
        align = jnp.where(valid, (Ustar / u_norm) @ psi_n, 0.0)
        score = alpha * ((coh - mu) / sigma) + (1.0 - alpha) * align
        score = jnp.where(valid, score, -jnp.inf)
        picks = mmr_select(normalize_rows(Y), score, bundle_k, lambda_div=0.5)
        return picks, score, align, it_s, res_s

    return jax.vmap(one)(Ys, psis, Bs, n_valids)


def bundle_ragged(
    corpora: Sequence[np.ndarray],
    psis: Sequence[np.ndarray],
    gates: Optional[Sequence[Optional[np.ndarray]]] = None,
    *,
    kneighbors: int = 6,
    lamG: float = 1.0,
    lamC: float = 0.5,
    lamQ: float = 4.0,
    bundle_k: int = 8,
    alpha: float = 0.5,
    dt: float = 1.0,
    tol: float = 1e-3,
    max_iters: int = 12,
) -> list[dict[str, Any]]:
    """Settle + bundle every corpus in ONE padded vmapped device program.

    Returns one dict per corpus: {bundle, iters, res, n} with the same
    bundle entry shape as `OscillinkLattice.bundle`.  Bundles are identical
    to serving each corpus alone (see module docstring).
    """
    if len(corpora) == 0:
        return []
    if len(psis) != len(corpora):
        raise ValueError("psis must match corpora")
    d = int(np.asarray(corpora[0]).shape[1])
    ns = [int(np.asarray(c).shape[0]) for c in corpora]
    n_pad = ((max(ns) + _BUCKET - 1) // _BUCKET) * _BUCKET

    b = len(corpora)
    Ys = np.zeros((b, n_pad, d), dtype=np.float32)
    Bs = np.zeros((b, n_pad), dtype=np.float32)
    Ps = np.zeros((b, d), dtype=np.float32)
    for i, (c, p) in enumerate(zip(corpora, psis)):
        c = np.asarray(c, dtype=np.float32)
        if c.shape[1] != d:
            raise ValueError("all corpora must share D")
        Ys[i, : ns[i]] = c
        Ps[i] = np.asarray(p, dtype=np.float32)
        g = None if gates is None else gates[i]
        Bs[i, : ns[i]] = (
            np.ones(ns[i], dtype=np.float32)
            if g is None
            else np.asarray(g, dtype=np.float32)
        )

    kb = min(int(bundle_k), max(ns))
    lam = EnergyParams.make(lamG, lamC, lamQ, 0.0)

    # each corpus clamps k to its own N-1 (lattice semantics); lanes with
    # the same effective k run in one vmapped call so a tiny corpus never
    # changes a larger one's graph
    k_effs = [min(int(kneighbors), max(1, n_i - 1)) for n_i in ns]
    out: list[Optional[dict[str, Any]]] = [None] * b
    for k_eff in sorted(set(k_effs)):
        lanes = [i for i in range(b) if k_effs[i] == k_eff]
        picks, score, align, iters, res = jax.device_get(
            _ragged_pipeline(
                jnp.asarray(Ys[lanes]),
                jnp.asarray(Ps[lanes]),
                jnp.asarray(Bs[lanes]),
                jnp.asarray(np.asarray([ns[i] for i in lanes], dtype=np.int32)),
                lam,
                k_eff,
                kb,
                jnp.float32(alpha),
                jnp.float32(dt),
                jnp.float32(tol),
                jnp.int32(max_iters),
            )
        )
        for li, i in enumerate(lanes):
            entries = [
                {
                    "id": int(j),
                    "score": float(score[li, j]),
                    "align": float(align[li, j]),
                }
                for j in picks[li]
                if j < ns[i] and np.isfinite(score[li, j])
            ][: min(kb, ns[i])]
            out[i] = {
                "bundle": entries,
                "iters": int(iters[li]),
                "res": float(res[li]),
                "n": ns[i],
            }
    return out  # type: ignore[return-value]
