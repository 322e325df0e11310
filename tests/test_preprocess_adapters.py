"""Diffusion gates, autocorrect, text adapters."""

import numpy as np
import pytest

from oscillink_tpu import OscillinkLattice, compute_diffusion_gates
from oscillink_tpu.adapters.text import embed_texts, simple_text_embed
from oscillink_tpu.preprocess.autocorrect import smart_correct


def test_diffusion_gates_range_and_shape():
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((40, 12)).astype(np.float32)
    psi = rng.standard_normal(12).astype(np.float32)
    h = compute_diffusion_gates(Y, psi, kneighbors=4)
    assert h.shape == (40,)
    assert h.min() >= 0.0 and h.max() <= 1.0
    assert h.dtype == np.float32


def test_diffusion_cg_close_to_direct():
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((36, 10)).astype(np.float32)
    psi = rng.standard_normal(10).astype(np.float32)
    h_direct = compute_diffusion_gates(Y, psi, kneighbors=4, deterministic_k=True)
    h_cg = compute_diffusion_gates(
        Y, psi, kneighbors=4, deterministic_k=True, method="cg", tol=1e-6, max_iters=512
    )
    np.testing.assert_allclose(h_direct, h_cg, atol=5e-3)


def test_diffusion_validation():
    Y = np.zeros((4, 3), dtype=np.float32)
    psi = np.zeros(3, dtype=np.float32)
    with pytest.raises(ValueError):
        compute_diffusion_gates(Y, psi, gamma=0.0)
    with pytest.raises(ValueError):
        compute_diffusion_gates(Y, psi, kneighbors=0)
    with pytest.raises(ValueError):
        compute_diffusion_gates(Y, np.zeros(5, dtype=np.float32))
    with pytest.raises(ValueError):
        compute_diffusion_gates(Y, psi, similarity="dot")


def test_diffusion_gates_usable_in_lattice():
    rng = np.random.default_rng(2)
    Y = rng.standard_normal((30, 8)).astype(np.float32)
    psi = rng.standard_normal(8).astype(np.float32)
    h = compute_diffusion_gates(Y, psi, kneighbors=3)
    lat = OscillinkLattice(Y, kneighbors=3)
    lat.set_query(psi, gates=h)
    lat.settle(max_iters=10)
    rec = lat.receipt()
    assert rec["meta"]["gates_uniform"] in (True, False)


def test_autocorrect_basics():
    assert smart_correct("teh cat") == "the cat"
    assert smart_correct("Teh cat") == "The cat"
    # all-caps tokens look like acronyms and are preserved
    assert smart_correct("TEH CAT") == "TEH CAT"
    # technical tokens preserved
    assert smart_correct("lamG teh API") == "lamG the API"
    assert smart_correct("snake_case teh") == "snake_case the"
    assert smart_correct("recieve2") == "recieve2"  # digit → skip


def test_autocorrect_code_fence():
    text = "teh start\n```\nteh inside\n```\nteh end"
    out = smart_correct(text)
    assert out.splitlines()[0] == "the start"
    assert out.splitlines()[2] == "teh inside"
    assert out.splitlines()[4] == "the end"


def test_autocorrect_custom_preserve():
    assert smart_correct("teh", custom_preserve=["teh"]) == "teh"


def test_simple_text_embed_deterministic():
    a = simple_text_embed(["hello", "world"], d=32)
    b = simple_text_embed(["hello", "world"], d=32)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)


def test_embed_texts_fallback():
    v = embed_texts(["a", "b", "c"], fallback_dim=16)
    assert v.shape == (3, 16)
    assert embed_texts([], fallback_dim=16).shape == (0, 16)


def test_from_texts_constructor():
    from oscillink_tpu import Oscillink

    texts = ["alpha beta", "beta gamma", "gamma delta", "delta epsilon"]
    lat = Oscillink.from_texts(texts, query="beta", kneighbors=2, embed_dim=32)
    assert (lat.N, lat.D) == (4, 32)
    assert np.linalg.norm(lat.psi) > 0  # query installed
    lat.settle()
    assert len(lat.bundle(k=2)) == 2
    lat2 = Oscillink.from_texts(texts, kneighbors=2, embed_dim=32)
    assert np.allclose(lat2.psi, 0)  # no query → zero psi


def test_lattice_diffusion_gates_reuse_graph():
    """lat.diffusion_gates fuses with the lattice's built graph and matches
    the standalone preprocessor at the same graph parameters."""
    import numpy as np

    from oscillink_tpu import Oscillink, compute_diffusion_gates

    rng = np.random.default_rng(0)
    Y = rng.standard_normal((300, 24)).astype(np.float32)
    psi = rng.standard_normal(24).astype(np.float32)

    ref = compute_diffusion_gates(
        Y, psi, kneighbors=6, beta=1.0, gamma=0.12, method="cg"
    )
    lat = Oscillink(Y, kneighbors=6)
    lat.set_query(psi)
    got = lat.diffusion_gates(beta=1.0, gamma=0.12, apply=True)
    assert got.shape == (300,)
    assert np.abs(got - ref).max() < 5e-3  # same graph contract, CG tolerance
    assert np.allclose(lat.B_diag, got)
    # gated settle runs
    out = lat.settle(max_iters=8, tol=1e-3)
    assert out["res"] is not None
