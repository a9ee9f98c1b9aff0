"""Pallas TPU kernel: SELL (sliced-ELL) SpMV for unstructured sparsity.

Design (see ``ops/sell.py`` for the format):

- 1-D grid over chunks, sorted by destination slab.  Two scalar-prefetch
  arrays steer the pipeline: ``bucket[g]`` selects the chunk's contiguous
  x window as an ordinary BlockSpec block (the "gather" of the operand is
  thereby a sequential DMA the pipeline double-buffers), and ``slab[g]``
  selects the revisited output block.
- The per-slot gather is an iota-compare + select over the W lanes of the
  window (pure VPU, no indexed memory access — TPU v5e has no usable
  hardware gather; probed in ``scripts/probe_gather*.py``):

      acc[r, :] += (iota_W == cols[r, k]) * vals[r, k] * x_window

  for k in 0..K-1, then one row-sum and one accumulate into the output
  block row (chunks of the same slab — further layers / other buckets —
  hit the same row; Pallas keeps the block in VMEM while consecutive grid
  steps map to it and flushes on change).
- The chunk list is pre-split at pack time into parts that fit the
  scalar-prefetch SMEM budget; one ``pallas_call`` per part, outputs
  concatenated (each part owns a disjoint output-block range).

Replaces the reference's arbitrary-CSR SpMV backends
(``kernels_mkl.cpp:326-352``, ``kernels_cuda.cpp:576-614``) for matrices
the DIA format rejects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmres_tpu.ops.sell import C, SLABS_PER_BLOCK, SELLMatrix, _pad_x


def _sell_kernel(bucket_ref, slab_ref, vals_ref, cols_ref, x_ref, y_ref, *,
                 W: int, K: int):
    g = pl.program_id(0)
    slab_g = slab_ref[g]
    blk = slab_g // SLABS_PER_BLOCK
    prev_blk = slab_ref[jnp.maximum(g - 1, 0)] // SLABS_PER_BLOCK
    is_first = jnp.logical_or(g == 0, blk != prev_blk)

    @pl.when(is_first)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    vals = vals_ref[0]  # (C, K)
    cols = cols_ref[0]  # (C, K) int32 in [0, W)
    xw = x_ref[...].reshape(1, W)
    iota = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    xb = jnp.broadcast_to(xw, (C, W))
    acc = jnp.zeros((C, W), vals.dtype)
    for k in range(K):
        ck = cols[:, k][:, None]
        vk = vals[:, k][:, None]
        acc = acc + jnp.where(iota == ck, vk * xb, jnp.zeros((), vals.dtype))
    y_slab = jnp.sum(acc, axis=1)  # (C,)

    row = slab_g - blk * SLABS_PER_BLOCK
    y_ref[pl.ds(row, 1), :] += y_slab[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("W", "K", "n_chunks", "n_slabs", "first_block",
                     "interpret"),
)
def _sell_call(bucket, slab, vals, cols, xp, *, W, K, n_chunks, n_slabs,
               first_block, interpret=False):
    kernel = functools.partial(_sell_kernel, W=W, K=K)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, C, K), lambda g, bk, sl: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, K), lambda g, bk, sl: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W,), lambda g, bk, sl: (bk[g],),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (SLABS_PER_BLOCK, C),
                lambda g, bk, sl: (sl[g] // SLABS_PER_BLOCK - first_block, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_slabs, C), vals.dtype),
            interpret=interpret,
        )(bucket, slab, vals, cols, xp)


def sell_spmv_pallas(A: SELLMatrix, x: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """y = A @ x via the windowed-compare kernel — one pallas_call per
    pre-split part; the per-part outputs cover disjoint contiguous output
    blocks and concatenate.  f32 only (Mosaic has no f64; the kernel is
    traced with x64 disabled, so f64 operands would silently truncate)."""
    if A.dtype != jnp.float32:
        raise TypeError(f"SELL Pallas kernel is f32-only, got {A.dtype}")
    x = x.astype(A.dtype)
    xp = _pad_x(A, x)
    n_slabs_total = A.n_rows_pad // C

    outs = []
    for p, (n_chunks, first_block, n_blocks) in enumerate(A.parts):
        outs.append(_sell_call(
            A.bucket[p], A.slab[p], A.data[p], A.cols[p], xp,
            W=A.W, K=A.K, n_chunks=n_chunks,
            n_slabs=n_blocks * SLABS_PER_BLOCK,
            first_block=first_block, interpret=interpret,
        ))
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    if y.shape[0] < n_slabs_total:
        # trailing blocks beyond the packed range (operator padded after
        # packing, e.g. to the solver's alignment) are identically zero
        y = jnp.pad(y, ((0, n_slabs_total - y.shape[0]), (0, 0)))
    return y.reshape(-1)[: A.n_rows]
