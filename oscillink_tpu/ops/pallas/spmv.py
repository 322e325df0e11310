"""Pallas gather-SpMV: the k-sparse normalized-Laplacian matvec.

    out[i] = X[i] - sum_k wn[i, k] * X[idx[i, k]]

This is the single hot op inside every CG iteration (SURVEY.md §2.1: the
reference's dense ``L_sym @ X`` at O(N^2 D) becomes O(N k D) here).  The
kernel processes a row block per grid step:

  * the block's neighbor ids live in SMEM (scalar-indexable),
  * neighbor rows are pulled from HBM by B*K single-row async DMAs, all in
    flight simultaneously on one counting semaphore (the DMA engine pipelines
    them; each row is D*4 bytes, contiguous),
  * the weighted reduction + identity axpy runs on the VPU over the VMEM
    gather buffer while the NEXT grid step's input blocks stream in (grid
    pipelining is automatic).

STATUS — EXPERIMENTAL, not on the default path.  Measured on TPU v5e
(chained 50-apply loop, N=5000/D=128/K=6): XLA's native gather+einsum
(`ops.graph.lap_matvec`) runs 0.063 ms/apply vs 1.05 ms/apply for this
kernel — XLA's vectorized gather beats B*K single-row DMAs by ~16x, and at
D=768 Mosaic rejects 1-row HBM slices ("slice shape along dim 0 must be
aligned to tiling (8)").  The XLA path is ~3-5x off the HBM
bandwidth bound, which is the bar a future kernel must clear (likely via
8-row-aligned grouped gathers or neighbor reordering for locality).  Kept
for the kernel-infrastructure it exercises and for interpret-mode tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lap_matvec_pallas"]

DEFAULT_BLOCK_ROWS = 256


def _spmv_kernel(idx_ref, wn_ref, xd_ref, x_hbm_ref, out_ref, gather, sem):
    B, K = idx_ref.shape

    def dma(t):
        b = t // K
        k = t % K
        j = idx_ref[b, k]
        return pltpu.make_async_copy(x_hbm_ref.at[j], gather.at[b, k], sem)

    def issue(t, _):
        dma(t).start()
        return 0

    def drain(t, _):
        dma(t).wait()
        return 0

    lax.fori_loop(0, B * K, issue, 0)
    lax.fori_loop(0, B * K, drain, 0)

    acc = xd_ref[:]
    for k in range(K):
        acc = acc - wn_ref[:, k][:, None] * gather[:, k, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def lap_matvec_pallas(
    idx: jax.Array,
    wn: jax.Array,
    X: jax.Array,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool = False,
) -> jax.Array:
    """(L_sym X) via the Pallas kernel. idx/wn: [N, K]; X: [N, D] float32."""
    n, k_max = idx.shape
    d = X.shape[1]
    B = min(block_rows, n)
    nblocks = -(-n // B)
    npad = nblocks * B
    if npad != n:
        # padded rows gather row 0 with weight 0 — contribute nothing
        idx = jnp.pad(idx, ((0, npad - n), (0, 0)))
        wn = jnp.pad(wn, ((0, npad - n), (0, 0)))
        Xd = jnp.pad(X, ((0, npad - n), (0, 0)))
    else:
        Xd = X

    out = pl.pallas_call(
        _spmv_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B, k_max), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, k_max), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # full X, resident in HBM
        ],
        out_specs=pl.BlockSpec((B, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, d), X.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, k_max, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx, wn, Xd, X)
    return out[:n]
