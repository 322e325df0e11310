"""Balanced-IVF 1M measurement: the capacity-constrained spillover rounds
vs the recorded pre-balancing results (benchmarks/ivf_1m.json).

Previously: the loose-cluster corpus (spread 0.6) overflowed 27436 rows at
C=1024 and was gate-rejected (its 3.7 s bf16 run was the recorded speed
ceiling); the accepted run needed 2x over-clustering (C=2048 -> 4.2M bucket
slots, 2x the scan work) and landed at 6.32 s.  With spillover balancing,
C=1024 (2M slots) should be acceptable on BOTH corpora — halving the scan
work of the accepted config.

Both corpora share one executable (same shapes), so the cold compile is
paid once.  Timings by perf_counter around a device_get of the outputs
(sync on this tunnel is untrustworthy — see bench.py:sync_is_trustworthy).

Run detached: nohup python benchmarks/probe_ivf_balanced_1m.py > log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ivf_balanced_1m.json")

N, D, K = 1_000_000, 768, 8
C, M = 1024, 8


def _corpus(spread, seed):
    import jax
    import jax.numpy as jnp

    kc, kn, ka = jax.random.split(jax.random.PRNGKey(seed), 3)
    # 1024 true clusters; rows = center + spread * noise (matches the
    # recorded corpora: tight spread 0.35 accepted, loose 0.6 gate-fired)
    centers = jax.random.normal(kc, (1024, D), dtype=jnp.float32) * 1.0
    assign = jax.random.randint(ka, (N,), 0, 1024)
    Y = centers[assign] + spread * jax.random.normal(kn, (N, D), dtype=jnp.float32)
    return jax.block_until_ready(Y)


def main():
    import jax

    from oscillink_tpu.ops.ivf import _sample_quality, ivf_topk

    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)

    from oscillink_tpu.ops.ivf import _round_up

    P = _round_up(int(2.0 * N / C), 128)
    print(f"# C={C} P={P} m={M} balance=3", flush=True)

    for name, spread in (("tight_035", 0.35), ("loose_060", 0.6)):
        if name in res and isinstance(res[name], dict):
            continue
        try:
            Y = _corpus(spread, seed=42 if name == "tight_035" else 43)
            t0 = time.perf_counter()
            vals, idx, ovf, filled = ivf_topk(
                Y, K, n_clusters=C, bucket_cap=P, m_probe=M,
                balance_rounds=3, balance_cands=4,
            )
            ovf_h = int(jax.device_get(ovf))
            cold_s = time.perf_counter() - t0
            print(f"# {name} cold {cold_s:.1f}s ovf={ovf_h}", flush=True)
            warms = []
            for _ in range(2):
                t0 = time.perf_counter()
                vals, idx, ovf, filled = ivf_topk(
                    Y, K, n_clusters=C, bucket_cap=P, m_probe=M,
                    balance_rounds=3, balance_cands=4,
                )
                ovf_h = int(jax.device_get(ovf))
                warms.append(time.perf_counter() - t0)
            rec, gap = _sample_quality(Y, vals, idx, K)
            rec, gap = float(jax.device_get(rec)), float(jax.device_get(gap))
            entry = {
                "ivf_warm_s": round(min(warms), 2),
                "ivf_cold_s": round(cold_s, 1),
                "overflow": ovf_h,
                "sampled_recall": round(rec, 4),
                "sim_gap_p99": round(gap, 6),
                "accepted": bool(ovf_h <= 2048 and (rec >= 0.9 or gap <= 0.01)),
            }
            res[name] = entry
            print(f"# {name}: {entry}", flush=True)
            del Y, vals, idx
        except Exception as e:  # pragma: no cover
            res[name] = f"failed: {type(e).__name__}: {str(e)[:160]}"
            print(f"# {name} FAILED: {e}", flush=True)
        with open(OUT, "w") as f:
            json.dump(res, f, indent=1)

    res["config"] = {
        "N": N, "D": D, "k": K, "n_clusters": C, "bucket_cap": P,
        "m_probe": M, "balance_rounds": 3,
        "prior": "pre-balancing (ivf_1m.json): accepted needed C=2048 "
        "(2x slots/work) at 6.32 s; C=1024 loose corpus overflowed 27436 "
        "and was rejected (3.7 s bf16 ceiling)",
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
