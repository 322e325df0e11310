"""Multi-query batching: one corpus, many queries through the vmapped solver
— the serving pattern where the graph build amortizes across the batch."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from oscillink_tpu import Oscillink


def main():
    rng = np.random.default_rng(0)
    N, D, Q = 2000, 128, 16
    Y = rng.standard_normal((N, D)).astype(np.float32)
    psis = rng.standard_normal((Q, D)).astype(np.float32)

    lat = Oscillink(Y, kneighbors=6)

    t0 = time.perf_counter()
    bundles = lat.bundle_batch(psis, k=5)
    t_batch = 1000 * (time.perf_counter() - t0)
    print(f"{Q} queries in {t_batch:.1f} ms ({t_batch / Q:.2f} ms/query)")
    for qi in (0, 1):
        print(f"  query {qi} top ids:", [e["id"] for e in bundles[qi]])

    # per-query U* batch (for custom downstream scoring)
    Ustars = lat.solve_Ustar_batch(psis[:4])
    print("U* batch shape:", Ustars.shape)


if __name__ == "__main__":
    main()
