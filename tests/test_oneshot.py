"""Fused one-shot settle+receipt parity with the incremental lattice API."""

import numpy as np
import pytest

from oscillink_tpu.core.lattice import OscillinkLattice
from oscillink_tpu.models.oneshot import settle_receipt_light


def test_oneshot_matches_lattice_light_receipt():
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((240, 48)).astype(np.float32)
    psi = rng.standard_normal(48).astype(np.float32)

    rec = settle_receipt_light(Y, psi, kneighbors=5)

    lat = OscillinkLattice(Y, kneighbors=5)
    lat.set_query(psi)
    lat.set_receipt_detail("light")
    lat.settle(dt=1.0, max_iters=12, tol=1e-3)
    ref = lat.receipt()

    assert rec["deltaH_total"] == pytest.approx(ref["deltaH_total"], rel=1e-5)
    assert rec["settle_iters"] >= 1 and rec["ustar_iters"] >= 1
    assert rec["ustar_res"] <= 1e-3
    assert rec["edge_count"] > 0


def test_oneshot_gates_clamped_and_applied():
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((120, 32)).astype(np.float32)
    psi = rng.standard_normal(32).astype(np.float32)
    gates = np.linspace(-0.5, 1.5, 120).astype(np.float32)  # clamped to [0,1]

    rec = settle_receipt_light(Y, psi, kneighbors=4, gates=gates)
    rec_uniform = settle_receipt_light(Y, psi, kneighbors=4)
    assert rec["deltaH_total"] != pytest.approx(rec_uniform["deltaH_total"])
