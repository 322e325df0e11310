"""Two-pass fast similarity build agrees with the exact build."""

import numpy as np
import jax
import jax.numpy as jnp

from oscillink_tpu.ops.graph import build_graph


def test_fast_build_matches_exact_blocked():
    rng = np.random.default_rng(0)
    N, D, K = 600, 32, 6
    Y = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    # force the blocked paths with a small dense_limit and block size
    g_exact = jax.jit(
        lambda Y: build_graph(Y, K, dense_limit=64, block_rows=128)
    )(Y)
    g_fast = jax.jit(
        lambda Y: build_graph(Y, K, dense_limit=64, block_rows=128, similarity="fast")
    )(Y)
    idx_e = np.sort(np.asarray(g_exact.idx), axis=1)
    idx_f = np.sort(np.asarray(g_fast.idx), axis=1)
    # neighbor sets agree on (nearly) every row; weights exact where they do
    agree_rows = (idx_e == idx_f).all(axis=1)
    assert agree_rows.mean() > 0.999
    w_e = np.sort(np.asarray(g_exact.w), axis=1)[agree_rows]
    w_f = np.sort(np.asarray(g_fast.w), axis=1)[agree_rows]
    np.testing.assert_allclose(w_f, w_e, rtol=1e-5, atol=1e-6)
