"""Straggler-skip kernel validation + measurement (real TPU).

The predicated straggler path (ops/pallas/window_spmv.py:_matmul_kernel3,
`strag_cnt` prefetch) skips the [s_max, D] DMA and the two correction
matmuls on blocks with no stragglers.  Measured motivation at the 125k
shard on locality-ordered data: p50 straggler count per block is 0 and the
unconditional fetch overfetches 17x (192 MB/apply vs 11 needed).

Two parts:
  1. PARITY on the real kernel (the CPU test mesh runs the interpret +
     scatter path, which never executes the predication): windowed matvec
     vs the XLA gather matvec at a TPU-shaped size, mixed empty/non-empty
     blocks.  Hard-fails on mismatch.
  2. Slope-timed windowed matvec + full cg5 body at 125k x 768 x k8 —
     before/after comparison against the committed northstar_125k.json.

Run detached:  nohup python benchmarks/probe_strag_skip.py > /tmp/strag_skip.log 2>&1 &
Writes benchmarks/strag_skip_125k.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

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


def parity():
    from oscillink_tpu.ops.graph import Graph, lap_matvec
    from oscillink_tpu.ops.pallas import window_spmv as ws

    rng = np.random.default_rng(1)
    n, d, k = 8192, 256, 6
    # local neighbors -> most blocks empty of stragglers; a far-jump band
    # in the middle -> a few heavily strag blocks (exercises both arms)
    idx = (np.arange(n)[:, None] + rng.integers(-200, 200, size=(n, k))) % n
    far = slice(3000, 3600)
    idx[far] = rng.integers(0, n, size=(600, k))
    idx = idx.astype(np.int32)
    wn = (rng.random((n, k)) * 0.1).astype(np.float32)
    plan, cov = ws.build_window_plan(idx, wn, W=384, n_windows=3)
    cnt = np.asarray(plan.strag_cnt)
    assert (cnt == 0).any() and (cnt > 0).any(), "test graph must mix arms"
    oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
    g = Graph(idx=jnp.asarray(idx), w=jnp.asarray(wn), wn=jnp.asarray(wn),
              sqrt_deg=jnp.ones(n))
    X = rng.standard_normal((n, d)).astype(np.float32)
    Xp = ws.pad_rows(jnp.asarray(X), plan.n_pad)
    out = np.asarray(ws.lap_matvec_windowed(plan, oh, Xp))[:n]
    ref = np.asarray(lap_matvec(g, jnp.asarray(X)))
    rel = float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-12))
    empty = int((cnt == 0).sum())
    print(f"# parity: rel={rel:.2e} cov={cov:.4f} "
          f"empty_blocks={empty}/{len(cnt)}", flush=True)
    assert rel < 5e-5, f"windowed kernel parity broke: rel={rel}"
    return {"rel_err": rel, "coverage": cov,
            "empty_blocks": empty, "blocks": int(len(cnt))}


def measure():
    from oscillink_tpu.ops.pallas import window_spmv as ws

    N, D, K = 125_000, 768, 8
    rng = np.random.default_rng(0)
    idx = ((np.arange(N)[:, None] + rng.integers(-400, 400, size=(N, K))) % N
           ).astype(np.int32)
    wn = (rng.random((N, K)) * 0.1).astype(np.float32)
    plan, cov = ws.build_window_plan(idx, wn, W=384, n_windows=3)
    oh = ws.build_onehot(plan, 384, ws.plan_s_max(plan))
    cnt = np.asarray(plan.strag_cnt)
    X = jnp.asarray(rng.standard_normal((plan.n_pad, D)).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=(3,))
    def chain_win(plan, oh, X, reps):
        def body(i, acc):
            return ws.lap_matvec_windowed(plan, oh, acc) * 0.999

        return jnp.sum(lax.fori_loop(0, reps, body, X)[:8, :8])

    win_ms = slope(lambda r: chain_win(plan, oh, X, r))
    print(f"# windowed matvec (strag-skip): {win_ms:.3f} ms/apply "
          f"(committed pre-change: 6.83)", flush=True)
    return {
        "windowed_ms_per_apply": round(win_ms, 3),
        "coverage": round(float(cov), 4),
        "empty_blocks": int((cnt == 0).sum()),
        "blocks": int(len(cnt)),
        "s_max": int(ws.plan_s_max(plan)),
        "pre_change_committed": {"windowed_ms_per_apply": 6.83,
                                 "source": "northstar_125k.json"},
        "config": "N=125k D=768 k=8 locality-ordered (+-400), W=384x3 R=256",
    }


def main():
    out = {"parity": parity(), "measure": measure()}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "strag_skip_125k.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
