"""Pallas kernel parity vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from oscillink_tpu.ops.graph import build_graph, lap_matvec
from oscillink_tpu.ops.pallas.spmv import lap_matvec_pallas


def test_spmv_kernel_matches_xla_path():
    rng = np.random.default_rng(0)
    N, D, K = 96, 128, 4
    Y = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    g = jax.jit(lambda Y: build_graph(Y, K))(Y)
    X = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    ref = lap_matvec(g, X)
    out = lap_matvec_pallas(g.idx, g.wn, X, block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_spmv_kernel_ragged_rows():
    # N not divisible by the block size exercises the padding path
    rng = np.random.default_rng(1)
    N, D, K = 50, 128, 3
    Y = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    g = jax.jit(lambda Y: build_graph(Y, K))(Y)
    X = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    ref = lap_matvec(g, X)
    out = lap_matvec_pallas(g.idx, g.wn, X, block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
