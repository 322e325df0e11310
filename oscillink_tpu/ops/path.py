"""Chain-prior path Laplacian as an edge-list op (no dense N x N matrix).

Behavioral contract (reference: oscillink/core/graph.py:96-111): build a path
adjacency over an ordered chain, weights max-combined on duplicate edges, then
the normalized Laplacian of it.  Nodes outside the chain have degree 0, so
their Laplacian row is the identity row — i.e. ``L_path @ X = X - W_path X``
acts on ALL nodes (this matters for settle's Jacobi diagonal, lattice.py:186).

TPU-first design: edges are a static-shape [E] COO list; the matvec is two
gathers + two deterministic scatter-adds.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PathGraph", "build_path_graph", "path_lap_matvec"]


class PathGraph(NamedTuple):
    """Undirected weighted edge list with normalized-Laplacian factors.

    src, dst: [E] int32 (src < dst for regular edges; src == dst self-loops)
    w:        [E] float32 adjacency weights
    wn:       [E] float32 degree-normalized weights (self-loops pre-halved so
              the symmetric two-sided scatter in `path_lap_matvec` lands once)
    sqrt_deg: [N] float32 sqrt(max(deg, 1e-12)) over path adjacency
    """

    src: jax.Array
    dst: jax.Array
    w: jax.Array
    wn: jax.Array
    sqrt_deg: jax.Array

    @property
    def n_edges(self) -> int:
        return self.src.shape[0]


def build_path_graph(
    n: int,
    chain: Sequence[int],
    weights: Optional[Sequence[float]] = None,
) -> PathGraph:
    """Build the path graph from an ordered chain (host-side, chains are tiny).

    Mirrors reference graph.py:96-111: consecutive chain nodes are linked,
    out-of-range indices dropped, duplicate edges keep the max weight.
    """
    if weights is None:
        weights = [1.0] * max(0, len(chain) - 1)
    edge_w: dict[tuple[int, int], float] = {}
    for a in range(len(chain) - 1):
        i, j = int(chain[a]), int(chain[a + 1])
        if not (0 <= i < n and 0 <= j < n):
            continue
        key = (min(i, j), max(i, j))
        w = float(weights[a])
        edge_w[key] = max(edge_w.get(key, 0.0), w)

    if edge_w:
        keys = sorted(edge_w)
        src = np.array([k[0] for k in keys], dtype=np.int32)
        dst = np.array([k[1] for k in keys], dtype=np.int32)
        w = np.array([edge_w[k] for k in keys], dtype=np.float32)
    else:
        src = np.zeros(0, dtype=np.int32)
        dst = np.zeros(0, dtype=np.int32)
        w = np.zeros(0, dtype=np.float32)

    deg = np.zeros(n, dtype=np.float32)
    for s, d, ww in zip(src, dst, w):
        deg[s] += ww
        if d != s:
            deg[d] += ww
    sqrt_deg = np.sqrt(np.maximum(deg, 1e-12)).astype(np.float32)
    wn = (w / (sqrt_deg[src] * sqrt_deg[dst])).astype(np.float32)
    # self-loops would be scattered from both endpoints below; pre-halve
    wn = np.where(src == dst, 0.5 * wn, wn).astype(np.float32)

    return PathGraph(
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        w=jnp.asarray(w),
        wn=jnp.asarray(wn),
        sqrt_deg=jnp.asarray(sqrt_deg),
    )


def path_lap_matvec(pg: PathGraph, X: jax.Array) -> jax.Array:
    """(L_path X) = X - D^-1/2 A_path D^-1/2 X via edge-parallel scatter-add."""
    if pg.n_edges == 0:
        return X
    Xs = jnp.take(X, pg.src, axis=0)
    Xd = jnp.take(X, pg.dst, axis=0)
    acc = jnp.zeros_like(X)
    acc = acc.at[pg.src].add(pg.wn[:, None] * Xd)
    acc = acc.at[pg.dst].add(pg.wn[:, None] * Xs)
    return X - acc
