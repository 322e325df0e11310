"""Hierarchical lattice-of-lattices: shard, settle locally, rank shards with
a super-lattice, compose receipts (docs/SCALING.md)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oscillink_tpu.parallel import hierarchical_settle


def main():
    rng = np.random.default_rng(0)
    N, D = 4096, 128
    topic = rng.standard_normal(D).astype(np.float32)
    Y = rng.standard_normal((N, D)).astype(np.float32)
    Y[:512] += 1.5 * topic  # one shard strongly on-topic
    psi = (topic / np.linalg.norm(topic)).astype(np.float32)

    out = hierarchical_settle(Y, psi, n_shards=8, kneighbors=6)
    print("composed deltaH:", round(out["deltaH_composed"], 2))
    print("shard ranking by settled query alignment:", out["super"]["ranking"])
    for r in out["shard_receipts"][:3]:
        print(f"  shard {r['shard']}: deltaH={r['deltaH']:.2f} align={r['align']:.3f}")
    print("composition sig:", out["composition_sig"][:16])


if __name__ == "__main__":
    main()
