"""Sharded mutual-kNN graph build: each device top-k's its own rows.

The O(N^2 D) similarity scan is the graph build's dominant cost.  Under
GSPMD the blocked `lax.map` is a sequential scan the partitioner cannot
split across devices, so the single-device build was the 1M-regime blocker
(VERDICT r1).  Here the scan runs under `shard_map`: every device holds its
row block, all-gathers the normalized anchors once (N x D over ICI), and
scans only its own rows — an n_dev-way parallel build.  The cheap O(N K^2)
mutual-mask/cap/normalize stage then runs on the full (replicated) [N, K]
top-k arrays via `ops.graph.graph_from_topk`, guaranteeing bit-identical
graphs to the single-device `build_graph` (same ops, same order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.graph import (
    DEFAULT_BLOCK_ROWS,
    Graph,
    _topk_blocked,
    _topk_blocked_fast,
    graph_from_topk,
    normalize_rows,
)

__all__ = ["build_graph_sharded"]


def build_graph_sharded(
    mesh: Mesh,
    Y: jax.Array,
    k: int,
    *,
    row_cap: float = 1.0,
    similarity: str = "exact",
    axis_name: str = "rows",
    block_rows: int = DEFAULT_BLOCK_ROWS,
) -> Graph:
    """Mutual-kNN graph over a row-sharded mesh; same contract as
    `ops.graph.build_graph` (exact top-k unless ``similarity`` is
    fast/fastest; ``"auto"`` resolves by N via
    `ops.graph.resolve_similarity`).  ``N`` must divide the mesh size."""
    from ..ops.graph import resolve_similarity

    n = Y.shape[0]
    similarity = resolve_similarity(n, similarity)
    if similarity == "cluster":
        raise ValueError(
            "similarity='cluster' (IVF) is single-device only; callers must "
            "realize it as 'fast' before the sharded build (sharded_path.py)"
        )
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"N={n} must divide mesh size {n_dev}")
    rows_per = n // n_dev
    br = min(block_rows, rows_per)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=(P(axis_name, None), P(axis_name, None)),
    )
    def local_topk(Y_l):
        Yn_l = normalize_rows(Y_l.astype(jnp.float32))
        Yn_full = lax.all_gather(Yn_l, axis_name, axis=0, tiled=True)
        off = lax.axis_index(axis_name) * rows_per
        if similarity == "fast":
            return _topk_blocked_fast(
                Yn_l, Yn_full, k, br, recall_target=0.99, row_offset=off
            )
        if similarity == "fastest":
            return _topk_blocked_fast(
                Yn_l, Yn_full, k, br, recall_target=0.95, row_offset=off
            )
        return _topk_blocked(Yn_l, Yn_full, k, br, row_offset=off)

    row = NamedSharding(mesh, P(axis_name, None))
    Yd = jax.device_put(jnp.asarray(Y), row)
    vals, idx = jax.jit(local_topk)(Yd)
    return jax.jit(partial(graph_from_topk, row_cap=row_cap))(vals, idx)
