"""Streaming & incremental updates: append-only corpora without rebuilds.

The reference designs this flow but never implements it
(docs/guides/SCALING.md "Streaming & Incremental Updates"): new embeddings
are buffered, integrated via a micro-lattice solve, only the super level is
re-solved, and every flush emits a delta receipt (deltaH_since_last).

  python examples/streaming_updates.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oscillink_tpu.parallel import StreamingLattice


def main():
    rng = np.random.default_rng(0)
    d = 64
    psi = rng.standard_normal(d).astype(np.float32)
    psi /= np.linalg.norm(psi)

    sl = StreamingLattice(psi, shard_size=128, max_shards=16, kneighbors=6)

    # a day of arrivals: four batches of fresh embeddings
    for batch in range(4):
        rows = rng.standard_normal((100, d)).astype(np.float32)
        receipts = sl.append(rows)  # auto-integrates full buckets
        for r in receipts:
            print(
                f"batch {batch}: integrated shard {r['new_shard']['shard']} "
                f"({r['new_shard']['rows']} rows) "
                f"deltaH_since_last={r['deltaH_since_last']:.2f} "
                f"composed={r['deltaH_composed']:.2f}"
            )

    # integrate the tail buffer and read the final composed receipt
    final = sl.flush()
    print(
        f"final: {final['n_shards']} shards / {final['total_rows']} rows, "
        f"super ranking {final['super']['ranking']}, "
        f"sig {final['composition_sig'][:16]}…"
    )

    # downward gate propagation: suppress the lowest-aligned shard
    super_gates = np.ones(sl.n_shards, dtype=np.float32)
    super_gates[final["super"]["ranking"][-1]] = 0.1
    eff = sl.propagate_gates(super_gates)
    print(f"suppressed shard mean effective gate: {eff[final['super']['ranking'][-1]].mean():.2f}")


if __name__ == "__main__":
    main()
