"""Can IVF-cluster ordering recover windowed coverage on ISOTROPIC data?

VERDICT r3 item 6.  The windowed tier needs plan coverage >= 0.92
(OSCILLINK_WINDOWED_MIN_COVERAGE); on isotropic 500k corpora the natural
row order measures ~0.12 and the tier disables itself, leaving the
gather fallback.  Untried in-tree lever: the balanced-IVF k-means
assignments (`ops/ivf.py`) are themselves a locality ordering — sort rows
by cluster id and neighbors that share a cluster land inside the same
window span.

This probe, on the real chip at 500k x 768 x k8 ISOTROPIC:
  1. builds the real mutual-kNN graph (fast scan, the production path);
  2. computes k-means cluster assignments (the ivf_topk Lloyd loop, bf16
     scan, C=1024) and a spillover-balanced variant;
  3. measures window-plan coverage for natural / ivf / balanced-ivf /
     PCA-bisection orders;
  4. if any order clears the 0.92 bar, slope-times the windowed matvec on
     the permuted graph.

Writes benchmarks/ivf_window_order_500k.json either way (the negative is
worth committing — it pins WHY the fallback tier exists).
Run detached:  nohup python benchmarks/probe_ivf_window_order.py > /tmp/ivfw.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OSCILLINK_COMPILE_CACHE_DIR", "/tmp/oscillink_jaxcache")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from oscillink_tpu.utils.compile_cache import configure_compile_cache

configure_compile_cache()

N, D, K, C = 500_000, 768, 8, 1024
R1, R2 = 4, 24


def slope(fn):
    for reps in (R1, R2):
        float(jax.device_get(fn(reps)))
    ts = []
    for reps in (R1, R2, R1, R2):
        t0 = time.perf_counter()
        float(jax.device_get(fn(reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    return ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / (R2 - R1)


@functools.partial(jax.jit, static_argnames=("c", "iters", "balance"))
def kmeans_assign(Yn, c, iters=6, balance=False):
    """The ivf_topk Lloyd loop (ops/ivf.py) reduced to its assignment;
    `balance=True` adds the capacity-constrained spillover rounds."""
    from oscillink_tpu.ops.graph import normalize_rows
    from oscillink_tpu.ops.ivf import _lloyd_update, _rank_in_cluster

    n, d = Yn.shape
    Yb = Yn.astype(jnp.bfloat16)
    cent = normalize_rows(Yn[:: max(n // c, 1)][:c])

    def lloyd(_, cent):
        A = jnp.dot(Yb, cent.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
        return _lloyd_update(A, Yn, cent, c, d)

    cent = lax.fori_loop(0, iters, lloyd, cent)
    A = jnp.dot(Yb, cent.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)
    if not balance:
        return jnp.argmax(A, axis=1).astype(jnp.int32)
    cap = -(-n // c)
    R = 4
    cvals, cidx = lax.top_k(A, R)

    def bal(_, ptr):
        cur = jnp.take_along_axis(cidx, ptr[:, None], axis=1)[:, 0]
        sim = jnp.take_along_axis(cvals, ptr[:, None], axis=1)[:, 0]
        order_r, _, pos_r = _rank_in_cluster(cur, sim, c, n)
        over = jnp.zeros((n,), bool).at[order_r].set(pos_r >= cap)
        return jnp.where(over & (ptr < R - 1), ptr + 1, ptr)

    ptr = lax.fori_loop(0, 3, bal, jnp.zeros((n,), jnp.int32))
    return jnp.take_along_axis(cidx, ptr[:, None], axis=1)[:, 0].astype(jnp.int32)


def coverage_for_order(idx, wn, perm):
    from oscillink_tpu.ops.pallas import window_spmv as ws

    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    idx_p = inv[idx[perm]].astype(np.int32)
    wn_p = wn[perm]
    plan, cov = ws.build_window_plan(idx_p, wn_p, W=384, n_windows=3)
    return float(cov), plan, idx_p, wn_p


def main():
    from oscillink_tpu.ops.graph import build_graph, normalize_rows
    from oscillink_tpu.ops.pallas import window_spmv as ws

    rng = np.random.default_rng(0)
    Y = rng.standard_normal((N, D)).astype(np.float32)
    Yd = jnp.asarray(Y)

    t0 = time.perf_counter()
    g = jax.block_until_ready(
        jax.jit(
            functools.partial(build_graph, k=K, similarity="fast")
        )(Yd)
    )
    print(f"# fast-scan graph built in {time.perf_counter()-t0:.1f}s",
          flush=True)
    idx = np.asarray(g.idx)
    wn = np.asarray(g.wn)

    out = {"config": f"N={N} D={D} k={K} ISOTROPIC, C={C}, W=384x3",
           "bar": 0.92, "orders": {}}

    nat = np.arange(N, dtype=np.int64)
    cov_nat, *_ = coverage_for_order(idx, wn, nat)
    out["orders"]["natural"] = round(cov_nat, 4)
    print(f"# coverage natural: {cov_nat:.4f}", flush=True)

    Yn = jax.block_until_ready(jax.jit(normalize_rows)(Yd))
    best = (cov_nat, "natural", None)
    for name, balance in (("ivf", False), ("ivf_balanced", True)):
        t0 = time.perf_counter()
        assign = np.asarray(
            jax.block_until_ready(kmeans_assign(Yn, C, balance=balance))
        )
        perm = np.argsort(assign, kind="stable")
        cov, plan, idx_p, wn_p = coverage_for_order(idx, wn, perm)
        out["orders"][name] = round(cov, 4)
        print(f"# coverage {name}: {cov:.4f} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
        if cov > best[0]:
            best = (cov, name, (plan, idx_p, wn_p))

    # PCA-bisection for completeness — host-side NumPy reimplementation of
    # parallel/reorder.py's recursion: the library version jits a
    # projection per SEGMENT SHAPE, which at 500k x levels=10 through the
    # tunnel means ~10 levels x 1.5 GB h2d + per-shape compiles (observed
    # 20+ min wedge); power iteration on the host is seconds
    def _pca_order_host(Y, levels=10):
        def lead(Yc):
            v = np.ones(Yc.shape[1], np.float32)
            v /= np.linalg.norm(v)
            for _ in range(8):
                v = Yc.T @ (Yc @ v)
                v /= np.linalg.norm(v) + 1e-12
            return v

        def rec(ids, depth):
            if len(ids) <= 2:
                return ids
            Yc = Y[ids] - Y[ids].mean(0, keepdims=True)
            proj = Yc @ lead(Yc)
            sorted_ids = ids[np.argsort(proj, kind="stable")]
            if depth >= levels:
                return sorted_ids
            mid = len(sorted_ids) // 2
            return np.concatenate(
                [rec(sorted_ids[:mid], depth + 1),
                 rec(sorted_ids[mid:], depth + 1)]
            )

        return rec(np.arange(Y.shape[0]), 1)

    try:
        t0 = time.perf_counter()
        perm = _pca_order_host(Y, levels=10)
        cov, plan, idx_p, wn_p = coverage_for_order(idx, wn, perm)
        out["orders"]["pca_bisect"] = round(cov, 4)
        print(f"# coverage pca_bisect: {cov:.4f} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
        if cov > best[0]:
            best = (cov, "pca_bisect", (plan, idx_p, wn_p))
    except Exception as e:  # record, don't die
        out["orders"]["pca_bisect"] = f"error: {e}"

    out["best_order"] = best[1]
    out["clears_bar"] = bool(best[0] >= 0.92)
    if best[2] is not None and best[0] >= 0.5:
        # even short of the bar, a big lift is worth timing
        plan, idx_p, wn_p = best[2]
        oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
        X = jnp.asarray(
            rng.standard_normal((plan.n_pad, D)).astype(np.float32)
        )

        @functools.partial(jax.jit, static_argnums=(3,))
        def chain_win(plan, oh, X, reps):
            def body(i, acc):
                return ws.lap_matvec_windowed(plan, oh, acc) * 0.999

            return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

        win_ms = slope(lambda r: chain_win(plan, oh, X, r))
        out["windowed_matvec_ms_best_order"] = round(win_ms, 3)
        print(f"# windowed matvec on {best[1]} order: {win_ms:.3f} ms",
              flush=True)

    with open("benchmarks/ivf_window_order_500k.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
