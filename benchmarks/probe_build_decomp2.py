"""Which part of OscillinkLattice construction costs ~200 s warm at 500k?

Variants (one process, sequential, lattice deleted + gc between):
  A  similarity="fast", OSCILLINK_WINDOWED_MATVEC=0  (baseline: h2d+scan+host prep)
  B  similarity="fast", windowed auto                 (adds window ctx build)
  C  similarity="auto" (cluster resolve), windowed 0  (adds clusterability gate)
  D  similarity="auto", windowed auto                 (production default)
Each run twice; both wall times printed (first may pay compiles).
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "build_decomp2_500k.json")


def main():
    from oscillink_tpu.core.lattice import OscillinkLattice

    n, d, k = 500_000, 768, 8
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    res = {}

    variants = [
        ("A_fast_nowin", "fast", "0"),
        ("B_fast_win", "fast", "auto"),
        ("C_auto_nowin", "auto", "0"),
        ("D_auto_win", "auto", "auto"),
    ]
    for name, sim, win in variants:
        os.environ["OSCILLINK_WINDOWED_MATVEC"] = win
        walls = []
        for _ in range(2):
            gc.collect()
            t0 = time.perf_counter()
            lat = OscillinkLattice(Y, kneighbors=k, similarity=sim)
            walls.append(round(1000.0 * (time.perf_counter() - t0), 1))
            gb = getattr(lat, "_graph_build_ms", None)
            del lat
            gc.collect()
        res[name] = {"walls_ms": walls, "graph_build_ms": gb}
        print(f"# {name}: {res[name]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
