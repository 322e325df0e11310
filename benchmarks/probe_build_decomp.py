"""Decompose the warm cluster-mode build at 500k iso: where did the ~50 s
of warm build wall go (vs the pre-cluster-routing ~50 s total)?

Phases timed separately, all warm (second pass in-process):
  h2d         numpy -> device transfer of Y
  clusterability   the sampled sub-k-means + SYNCHRONOUS scalar fetch
  fast_scan   the jitted fast build program (device, synced via tiny fetch)
  lattice     full OscillinkLattice construction wall (includes the above
              plus host prep, window ctx, token)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "build_decomp_500k.json")


def main():
    import jax
    import jax.numpy as jnp

    from oscillink_tpu.core.lattice import OscillinkLattice, _jit_build_graph
    from oscillink_tpu.ops.ivf import _clusterability

    n, d, k = 500_000, 768, 8
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    res = {}

    def phase(name, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        res[name] = round(best * 1000.0, 1)
        print(f"# {name}: {res[name]} ms", flush=True)
        return out

    Yd = phase("h2d", lambda: jax.block_until_ready(jnp.asarray(Y)))
    phase("clusterability_incl_fetch",
          lambda: float(jax.device_get(_clusterability(Yd))))

    def scan():
        g, ne = _jit_build_graph(Yd, None, k, jnp.float32(1.0), similarity="fast")
        return int(jax.device_get(ne))

    phase("fast_scan_incl_edgecount_fetch", scan)

    def full():
        lat = OscillinkLattice(Y, kneighbors=k, similarity="auto")
        return lat

    phase("lattice_full_construction", full, reps=2)

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
