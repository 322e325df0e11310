"""Diffusion-gated settle: derive per-node gates from a screened-Poisson
solve over the anchor graph, then settle with them."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oscillink_tpu import Oscillink, compute_diffusion_gates


def main():
    N, D = 400, 64
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((N, D)).astype(np.float32)
    psi = Y[:30].mean(axis=0)
    psi = (psi / (np.linalg.norm(psi) + 1e-12)).astype(np.float32)

    # uniform gating
    lat_u = Oscillink(Y, kneighbors=6)
    lat_u.set_query(psi)
    lat_u.settle()
    rec_u = lat_u.receipt()

    # diffusion gating
    gates = compute_diffusion_gates(Y, psi, kneighbors=6, gamma=0.1)
    lat_g = Oscillink(Y, kneighbors=6)
    lat_g.set_query(psi, gates=gates)
    lat_g.settle()
    rec_g = lat_g.receipt()

    print("uniform deltaH:", rec_u["deltaH_total"])
    print("gated   deltaH:", rec_g["deltaH_total"], "(lower = more selective pull)")
    print("gates: min %.3f max %.3f mean %.3f" % (gates.min(), gates.max(), gates.mean()))


if __name__ == "__main__":
    main()
