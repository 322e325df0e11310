"""Shard-time the 1M/8 graph build: the per-chip slice on the real chip.

VERDICT r3 item 3: the sharded 8-way build's per-chip cost (~1.2 s
projected from the 9.9 s single-chip 1M fast scan) was the one unmeasured
term in the 1M E2E budget.  Under `parallel/sharded_build.py` each chip
scans ITS OWN 125k query rows against the all-gathered 1M keys — exactly
what `_topk_blocked_fast(Yq=125k, Yn=1M, ...)` computes on one device.
This probe runs that slice on the real chip at the exact geometry
(125k query rows x 1M keys x 768, bf16 MXU scan + approx_max_k +
exact f32 rescore, recall 0.99), plus the replicated O(N K^2)
`graph_from_topk` stage every chip repeats, slope-timed; the remaining
ICI all_gather term (875k rows x 768 x 4 B = 2.7 GB/chip, one-time per
build) is bounded analytically.

Writes benchmarks/sharded_build_slice_1m.json.
Run detached:  nohup python benchmarks/probe_sharded_build_slice.py > /tmp/sbs.log 2>&1 &
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

N_FULL, N_SLICE, D, K = 1_000_000, 125_000, 768, 8
R1, R2 = 1, 3


def slope(fn):
    # float(device_get(...)) — an actual scalar FETCH, not block_until_ready:
    # through the axon tunnel the completion sync can return before the
    # compute finishes (the round-3 "lying completion-sync" failure mode,
    # which is how this probe's first artifact measured -0.0 ms for a
    # >=1 s MXU scan); a data fetch cannot complete early.
    for reps in (R1, R2):
        float(jax.device_get(fn(reps)))
    ts = []
    for reps in (R1, R2, R1, R2):
        t0 = time.perf_counter()
        float(jax.device_get(fn(reps)))
        ts.append(1000.0 * (time.perf_counter() - t0))
    return ((ts[1] + ts[3]) / 2 - (ts[0] + ts[2]) / 2) / (R2 - R1)


def main():
    from oscillink_tpu.ops.graph import (
        DEFAULT_BLOCK_ROWS,
        _topk_blocked_fast,
        graph_from_topk,
        normalize_rows,
    )

    rng = np.random.default_rng(0)
    # clustered corpus (the bench/IVF study generator shape): 64 centers
    centers = rng.standard_normal((64, D)).astype(np.float32)
    assign = rng.integers(0, 64, size=N_FULL)
    Y = (centers[assign] + 0.35 * rng.standard_normal((N_FULL, D))).astype(
        np.float32
    )
    Yn = jax.block_until_ready(jax.jit(normalize_rows)(jnp.asarray(Y)))
    del Y

    # --- per-chip scan slice: 125k query rows x 1M keys ------------------
    @functools.partial(jax.jit, static_argnums=(2,))
    def scan_slice(Yq, Yn, reps):
        # the scale factor carries a loop dependence so XLA cannot hoist
        # the (otherwise loop-invariant) scan out of the fori_loop
        def body(i, carry):
            acc, scale = carry
            vals, idx = _topk_blocked_fast(
                Yq * scale, Yn, K, DEFAULT_BLOCK_ROWS,
                recall_target=0.99, row_offset=0,
            )
            s = vals.sum()
            return acc + s + idx.sum(), 1.0 + 1e-12 * s

        return lax.fori_loop(
            0, reps, body, (jnp.float32(0.0), jnp.float32(1.0))
        )[0]

    Yq = Yn[:N_SLICE]
    scan_ms = slope(lambda r: scan_slice(Yq, Yn, r))
    print(f"# per-chip scan slice (125k x 1M): {scan_ms:.1f} ms", flush=True)

    # --- replicated mutual-mask/cap/normalize stage at full 1M -----------
    vals, idx = jax.block_until_ready(
        jax.jit(
            lambda Yq, Yn: _topk_blocked_fast(
                Yq, Yn, K, DEFAULT_BLOCK_ROWS, recall_target=0.99, row_offset=0
            )
        )(Yn, Yn)
    )

    @functools.partial(jax.jit, static_argnums=(2,))
    def from_topk(vals, idx, reps):
        def body(i, carry):
            acc, scale = carry
            g = graph_from_topk(vals * scale, idx, row_cap=1.0)
            s = g.wn.sum()
            return acc + s + g.sqrt_deg.sum(), 1.0 + 1e-12 * s

        return lax.fori_loop(
            0, reps, body, (jnp.float32(0.0), jnp.float32(1.0))
        )[0]

    ftk_ms = slope(lambda r: from_topk(vals, idx, r))
    print(f"# graph_from_topk at 1M (replicated stage): {ftk_ms:.1f} ms",
          flush=True)

    gather_gb = (N_FULL - N_SLICE) * D * 4 / 1e9
    out = {
        "config": f"per-chip slice of the 1M/8 sharded build: "
                  f"{N_SLICE} query rows x {N_FULL} keys, D={D}, k={K}, "
                  f"bf16 scan + approx_max_k(recall 0.99) + exact f32 rescore",
        "device": str(jax.devices()[0].device_kind),
        "scan_slice_ms": round(scan_ms, 1),
        "graph_from_topk_1m_ms": round(ftk_ms, 1),
        "per_chip_build_ms": round(scan_ms + ftk_ms, 1),
        "ici_all_gather": {
            "bytes_per_chip_gb": round(gather_gb, 2),
            "note": "one-time per build; ~2.7 GB inbound/chip over ICI "
                    "(v5e ~45 GB/s/link aggregate) ~ tens of ms, "
                    "amortized over the full scan",
        },
        "prior": {
            "single_chip_1m_fast_scan_s": 9.9,
            "projection_was_s": 1.2,
            "source": "scale_tpu.json build_1M_device_round3",
        },
        "method": "slope (T3-T1)/2, two passes averaged, one real chip",
    }
    with open("benchmarks/sharded_build_slice_1m.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
