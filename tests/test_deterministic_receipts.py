"""Deterministic deltaH: fixed-order f64-tree accumulation.

On IEEE-f64 backends (the CPU test mesh) the device result must be
BIT-IDENTICAL to the executable NumPy spec `deltaH_tree_np`.  On TPU the
f64 emulation (double-float, ~48-bit adds) bounds the cross-backend delta at
~4e-14 relative — documented in BASELINE.md; per-backend the value is
bit-stable across runs and mesh layouts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oscillink_tpu.core.lattice import OscillinkLattice
from oscillink_tpu.models.coherence import EnergyParams
from oscillink_tpu.ops.graph import build_graph
from oscillink_tpu.ops.receipts import (
    deltaH_trace_deterministic,
    deltaH_tree_np,
)


def _state(n=700, d=48, k=5, seed=0):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d)).astype(np.float32)
    U = (Y + 0.1 * rng.standard_normal((n, d))).astype(np.float32)
    Us = (Y + 0.05 * rng.standard_normal((n, d))).astype(np.float32)
    B = rng.random(n).astype(np.float32)
    g = jax.jit(lambda Y: build_graph(Y, k))(jnp.asarray(Y))
    return g, U, Us, B


def test_bitwise_matches_numpy_spec():

    g, U, Us, B = _state()
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)
    with jax.enable_x64(True):
        dev = float(
            jax.jit(deltaH_trace_deterministic)(
                g, None, jnp.asarray(U), jnp.asarray(Us), lam, jnp.asarray(B)
            )
        )
        dev2 = float(
            jax.jit(deltaH_trace_deterministic)(
                g, None, jnp.asarray(U), jnp.asarray(Us), lam, jnp.asarray(B)
            )
        )
    ref = float(
        deltaH_tree_np(np.asarray(g.idx), np.asarray(g.wn), U, Us, 1.0, 0.5, 4.0, B)
    )
    assert dev.hex() == dev2.hex(), "not run-stable"
    assert dev.hex() == ref.hex(), f"device {dev.hex()} != numpy spec {ref.hex()}"


def test_receipt_mode_flag(monkeypatch):
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((150, 32)).astype(np.float32)
    psi = rng.standard_normal(32).astype(np.float32)

    monkeypatch.setenv("OSCILLINK_DETERMINISTIC_RECEIPTS", "1")
    lat = OscillinkLattice(Y, kneighbors=5)
    lat.set_query(psi)
    lat.settle(max_iters=12, tol=1e-3)
    r1 = lat.receipt()
    assert r1["meta"]["deltaH_mode"] == "deterministic-f64-tree"
    # repeat: bit-stable
    lat2 = OscillinkLattice(Y, kneighbors=5)
    lat2.set_query(psi)
    lat2.settle(max_iters=12, tol=1e-3)
    r2 = lat2.receipt()
    assert float(r1["deltaH_total"]).hex() == float(r2["deltaH_total"]).hex()
    # agrees with the standard mode within float32 reduction noise
    monkeypatch.setenv("OSCILLINK_DETERMINISTIC_RECEIPTS", "0")
    lat3 = OscillinkLattice(Y, kneighbors=5)
    lat3.set_query(psi)
    lat3.settle(max_iters=12, tol=1e-3)
    r3 = lat3.receipt()
    assert r3["meta"]["deltaH_mode"] == "standard"
    assert r1["deltaH_total"] == pytest.approx(r3["deltaH_total"], rel=1e-5)


def test_chain_bitwise_matches_numpy_spec():
    """Chain priors accumulate in sorted-edge order — the deterministic path
    covers the FULL operator M including lamP L_path (reference
    receipts.py:10-25 contract)."""
    from oscillink_tpu.ops.path import build_path_graph

    g, U, Us, B = _state(n=300, d=24, k=4, seed=7)
    pg = build_path_graph(300, [5, 1, 42, 17, 99, 3], weights=[1.0, 0.7, 1.2, 0.9, 1.1])
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.3)
    with jax.enable_x64(True):
        dev = float(
            jax.jit(deltaH_trace_deterministic)(
                g, pg, jnp.asarray(U), jnp.asarray(Us), lam, jnp.asarray(B)
            )
        )
        dev2 = float(
            jax.jit(deltaH_trace_deterministic)(
                g, pg, jnp.asarray(U), jnp.asarray(Us), lam, jnp.asarray(B)
            )
        )
    ref = float(
        deltaH_tree_np(
            np.asarray(g.idx), np.asarray(g.wn), U, Us, 1.0, 0.5, 4.0, B,
            path_src=np.asarray(pg.src), path_dst=np.asarray(pg.dst),
            path_wn=np.asarray(pg.wn), lamP=0.3,
        )
    )
    assert dev.hex() == dev2.hex(), "not run-stable"
    assert dev.hex() == ref.hex(), f"device {dev.hex()} != numpy spec {ref.hex()}"


def test_chain_receipt_is_deterministic(monkeypatch):
    """End-to-end: a chained lattice with OSCILLINK_DETERMINISTIC_RECEIPTS=1
    reports deterministic mode and bit-stable deltaH across fresh lattices."""
    monkeypatch.setenv("OSCILLINK_DETERMINISTIC_RECEIPTS", "1")
    rng = np.random.default_rng(2)
    Y = rng.standard_normal((90, 16)).astype(np.float32)

    def run():
        lat = OscillinkLattice(Y, kneighbors=4)
        lat.add_chain([0, 3, 7, 11], lamP=0.2)
        lat.set_query(np.zeros(16, dtype=np.float32))
        lat.settle(max_iters=12, tol=1e-3)
        return lat.receipt()

    r1, r2 = run(), run()
    assert r1["meta"]["deltaH_mode"] == "deterministic-f64-tree"
    assert float(r1["deltaH_total"]).hex() == float(r2["deltaH_total"]).hex()


def test_bitwise_stable_across_mesh_layouts():
    """The fixed-order tree accumulation must give identical BITS whether
    inputs are replicated or row-sharded over 2/4/8 devices (the §5.8
    cross-topology receipt-reproducibility claim)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from oscillink_tpu.parallel.mesh import lattice_mesh

    g, U, Us, B = _state(n=704, d=32, k=5, seed=3)
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.0)

    def run(n_dev):
        with jax.enable_x64(True):
            if n_dev == 0:
                return float(
                    jax.jit(deltaH_trace_deterministic)(
                        g, None, jnp.asarray(U), jnp.asarray(Us), lam, jnp.asarray(B)
                    )
                )
            mesh = lattice_mesh(n_dev)
            row = NamedSharding(mesh, P("rows", None))
            vec = NamedSharding(mesh, P("rows"))
            gs = type(g)(
                idx=jax.device_put(g.idx, row),
                w=jax.device_put(g.w, row),
                wn=jax.device_put(g.wn, row),
                sqrt_deg=jax.device_put(g.sqrt_deg, vec),
            )
            return float(
                jax.jit(deltaH_trace_deterministic)(
                    gs,
                    None,
                    jax.device_put(jnp.asarray(U), row),
                    jax.device_put(jnp.asarray(Us), row),
                    lam,
                    jax.device_put(jnp.asarray(B), vec),
                )
            )

    base = run(0)
    for n_dev in (2, 4, 8):
        got = run(n_dev)
        assert got.hex() == base.hex(), (
            f"mesh layout {n_dev} changed deltaH bits: {got.hex()} vs {base.hex()}"
        )


def test_chained_bitwise_stable_across_mesh_layouts():
    """Same cross-layout bit-stability with a chain prior attached (the path
    edge list is tiny and stays replicated; its scatter order is pinned)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from oscillink_tpu.ops.path import build_path_graph
    from oscillink_tpu.parallel.mesh import lattice_mesh

    g, U, Us, B = _state(n=704, d=32, k=5, seed=11)
    pg = build_path_graph(704, [3, 700, 18, 255, 512], weights=[1.0, 0.8, 1.3, 0.6])
    lam = EnergyParams.make(1.0, 0.5, 4.0, 0.25)

    def run(n_dev):
        with jax.enable_x64(True):
            if n_dev == 0:
                return float(
                    jax.jit(deltaH_trace_deterministic)(
                        g, pg, jnp.asarray(U), jnp.asarray(Us), lam, jnp.asarray(B)
                    )
                )
            mesh = lattice_mesh(n_dev)
            row = NamedSharding(mesh, P("rows", None))
            vec = NamedSharding(mesh, P("rows"))
            gs = type(g)(
                idx=jax.device_put(g.idx, row),
                w=jax.device_put(g.w, row),
                wn=jax.device_put(g.wn, row),
                sqrt_deg=jax.device_put(g.sqrt_deg, vec),
            )
            return float(
                jax.jit(deltaH_trace_deterministic)(
                    gs,
                    pg,
                    jax.device_put(jnp.asarray(U), row),
                    jax.device_put(jnp.asarray(Us), row),
                    lam,
                    jax.device_put(jnp.asarray(B), vec),
                )
            )

    base = run(0)
    for n_dev in (2, 8):
        got = run(n_dev)
        assert got.hex() == base.hex(), (
            f"mesh layout {n_dev} changed chained deltaH bits: "
            f"{got.hex()} vs {base.hex()}"
        )
