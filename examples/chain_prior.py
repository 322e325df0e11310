"""Chain priors: attach an ordered reasoning chain, verify per-link coherence.

The chain Laplacian term pulls consecutive chain nodes together; the chain
receipt z-scores every link against the node's structural residual
distribution and returns a verdict + weakest link.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oscillink_tpu import Oscillink


def main():
    rng = np.random.default_rng(0)
    N, D = 200, 64
    Y = rng.standard_normal((N, D)).astype(np.float32)
    # make a coherent chain: consecutive steps drift slowly
    chain = [10, 11, 12, 13, 14]
    for a, b in zip(chain[:-1], chain[1:]):
        Y[b] = Y[a] + 0.15 * rng.standard_normal(D).astype(np.float32)
    psi = (Y[10] / np.linalg.norm(Y[10])).astype(np.float32)

    lat = Oscillink(Y, kneighbors=6)
    lat.set_query(psi)
    lat.add_chain(chain, lamP=0.3)
    lat.settle()

    rec = lat.chain_receipt(chain)
    print("verdict:", rec["verdict"])
    print("coherence_gain:", round(rec["coherence_gain"], 4))
    for e in rec["edges"]:
        print(
            f"  link {e['edge']}: z_struct={e['z_struct']:.2f} z_path={e['z_path']:.2f}"
        )

    # now a broken chain through an unrelated node
    broken = [10, 11, 150, 13, 14]
    rec2 = lat.chain_receipt(broken)
    print("broken verdict:", rec2["verdict"], "| weakest:", rec2["weakest_link"])


if __name__ == "__main__":
    main()
