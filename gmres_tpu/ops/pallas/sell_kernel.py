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

from gmres_tpu.ops.sell import C, G_BATCH, SLABS_PER_BLOCK, SELLMatrix, _pad_x


# Outstanding manually-rotated window DMAs: the measured ~400 ns/chunk
# floor tracks the x-window fetch latency under the default 2-deep
# BlockSpec pipeline, so the windows are DMA'd by hand with this much
# lookahead (must cover G_BATCH x the latency/compute ratio).
# Env-tunable for hardware A/B sweeps (GMRES_TPU_SELL_WIN_DEPTH); the
# kernel prefetches _WIN_DEPTH - G windows ahead, so the depth must
# exceed G_BATCH (floored here) and defaults to twice it.
import os as _os

_WIN_DEPTH = max(
    int(_os.environ.get("GMRES_TPU_SELL_WIN_DEPTH", str(2 * G_BATCH))),
    G_BATCH + 1,
)

# x-RESIDENT mode: when the (padded) operand fits this VMEM budget, copy
# the whole x into VMEM scratch ONCE per call and read chunk windows by
# dynamic index — the per-chunk window DMA (its latency was the measured
# per-chunk floor, ~160 ns fixed + lane cost) disappears entirely.  At
# n=1M f32 the operand is 4 MB.  Disable for A/B with
# GMRES_TPU_SELL_NO_XRES=1.  The gate constants live in ops/sell.py so
# the pack-time G choice (pick_g) agrees with the kernel dispatch here.
from gmres_tpu.ops.sell import NO_XRES as _NO_XRES
from gmres_tpu.ops.sell import XRES_MAX_BYTES as _XRES_MAX_BYTES


def _sell_kernel_xres(bucket_ref, slab_ref, packed_ref, x_hbm, y_ref, xv,
                      xsem, *, W: int, K: int, G: int):
    """One grid step = G chunks of one output block; the WHOLE operand
    lives in VMEM scratch (one bulk DMA at step 0), so a chunk's window
    is a dynamic-index read with no per-chunk DMA or semaphore."""
    step = pl.program_id(0)
    base = step * G

    @pl.when(step == 0)
    def _():
        cp = pltpu.make_async_copy(x_hbm, xv, xsem)
        cp.start()
        cp.wait()

    blk = slab_ref[base] // SLABS_PER_BLOCK
    prev_blk = slab_ref[jnp.maximum(base - G, 0)] // SLABS_PER_BLOCK
    is_first = jnp.logical_or(step == 0, blk != prev_blk)

    @pl.when(is_first)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    for i in range(G):
        buf = packed_ref[i]  # (2K, C): [vals_f32 ; bitcast cols]
        vals = buf[:K]
        cols = jax.lax.bitcast_convert_type(buf[K:], jnp.int32)
        xw = xv[bucket_ref[base + i]]  # (1, W)
        dense = jnp.zeros((W, C), vals.dtype)
        for k in range(K):
            dense = dense + jnp.where(
                iota == cols[k:k + 1, :], vals[k:k + 1, :],
                jnp.zeros((), vals.dtype),
            )
        y_row = jnp.dot(xw, dense, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (1, C)
        row = slab_ref[base + i] - blk * SLABS_PER_BLOCK
        y_ref[pl.ds(row, 1), :] += y_row.astype(vals.dtype)


def _sell_kernel(bucket_ref, slab_ref, packed_ref, x_hbm, y_ref, xwin, wsem,
                 *, W: int, K: int, G: int, n_chunks: int, depth: int):
    """One grid step = G chunks of one output block; x windows ride a
    ``depth``-deep manual DMA rotation (deeper than the BlockSpec
    pipeline's double buffering — the window fetch latency was the
    measured per-chunk floor)."""
    step = pl.program_id(0)
    base = step * G

    def win_dma(c):
        # chunk index c -> its (1, W) window into rotation slot c % depth
        return pltpu.make_async_copy(
            x_hbm.at[bucket_ref[c]],
            xwin.at[jax.lax.rem(c, depth)],
            wsem.at[jax.lax.rem(c, depth)],
        )

    @pl.when(step == 0)
    def _():
        for c in range(min(depth - G, n_chunks)):
            win_dma(jnp.asarray(c, jnp.int32)).start()

    # keep the rotation full: issue the windows this step's lookahead spans
    for i in range(G):
        nxt = base + (depth - G) + i
        @pl.when(nxt < n_chunks)
        def _(nxt=nxt):
            win_dma(nxt).start()

    blk = slab_ref[base] // SLABS_PER_BLOCK
    prev_blk = slab_ref[jnp.maximum(base - G, 0)] // SLABS_PER_BLOCK
    is_first = jnp.logical_or(step == 0, blk != prev_blk)

    @pl.when(is_first)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    for i in range(G):
        buf = packed_ref[i]  # (2K, C): [vals_f32 ; bitcast cols]
        vals = buf[:K]
        cols = jax.lax.bitcast_convert_type(buf[K:], jnp.int32)
        win_dma(base + i).wait()
        xw = xwin[jax.lax.rem(base + i, depth)]  # (1, W)
        # Densify the slab with the window along SUBLANES and the 128
        # rows along LANES: dense[w, r] = sum of slot values with column
        # w in row r (cmp + select + add per slot).  The contraction over
        # w is then one MXU matvec, and the result lands lane-oriented —
        # exactly the output block's row layout, no relayout.
        dense = jnp.zeros((W, C), vals.dtype)
        for k in range(K):
            dense = dense + jnp.where(
                iota == cols[k:k + 1, :], vals[k:k + 1, :],
                jnp.zeros((), vals.dtype),
            )
        # HIGHEST precision: the MXU's default f32 path rounds through one
        # bf16 pass (measured 1.8e-3 relative error on the SpMV); Mosaic
        # supports only DEFAULT and HIGHEST
        y_row = jnp.dot(xw, dense, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (1, C)
        row = slab_ref[base + i] - blk * SLABS_PER_BLOCK
        y_ref[pl.ds(row, 1), :] += y_row.astype(vals.dtype)


def _sell_dense_kernel(bucket_ref, slab_ref, vidx_ref, blocks_ref, x_ref,
                       y_ref, *, W: int):
    """Dense (W, C) block chunk: y_row += x_window @ block — one MXU
    matvec, no densify (pairs above the fill threshold)."""
    g = pl.program_id(0)
    slab_g = slab_ref[g]
    blk = slab_g // SLABS_PER_BLOCK
    prev_blk = slab_ref[jnp.maximum(g - 1, 0)] // SLABS_PER_BLOCK
    is_first = jnp.logical_or(g == 0, blk != prev_blk)

    @pl.when(is_first)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    xw = x_ref[0]       # (1, W)
    block = blocks_ref[0]  # (W, C)
    y_row = jnp.dot(xw, block, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (1, C)
    row = slab_g - blk * SLABS_PER_BLOCK
    y_ref[pl.ds(row, 1), :] += y_row.astype(block.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("W", "n_chunks", "n_slabs", "first_block", "interpret"),
)
def _dense_call(bucket, slab, vidx, blocks, xp, *, W, n_chunks, n_slabs,
                first_block, interpret=False):
    kernel = functools.partial(_sell_dense_kernel, W=W)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_chunks,),
            in_specs=[
                # value-block index is prefetch-steered so dummy coverage
                # chunks share the all-zero block 0 (and consecutive equal
                # indices skip the re-fetch)
                pl.BlockSpec((1, W, C), lambda g, bk, sl, vi: (vi[g], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W), lambda g, bk, sl, vi: (bk[g], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (SLABS_PER_BLOCK, C),
                lambda g, bk, sl, vi: (sl[g] // SLABS_PER_BLOCK - first_block, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_slabs, C), blocks.dtype),
            interpret=interpret,
        )(bucket, slab, vidx, blocks, xp)


@functools.partial(
    jax.jit,
    static_argnames=("W", "K", "G", "n_chunks", "n_slabs", "first_block",
                     "interpret", "xres"),
)
def _sell_call(bucket, slab, packed, xp, *, W, K, G=4, n_chunks, n_slabs,
               first_block, interpret=False, xres=None):
    assert n_chunks % G == 0, n_chunks
    n_buckets = xp.shape[0]
    # xres is an explicit static arg (not read from the module global at
    # trace time) so callers toggling NO_XRES get distinct jit cache keys
    # (ADVICE round-4 medium: the A/B test was vacuous otherwise).
    if xres is None:
        xres = (not _NO_XRES) and n_buckets * W * 4 <= _XRES_MAX_BYTES
    if xres:
        kernel = functools.partial(_sell_kernel_xres, W=W, K=K, G=G)
        scratch = [
            pltpu.VMEM((n_buckets, 1, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        depth = max(_WIN_DEPTH, G + 1)
        kernel = functools.partial(_sell_kernel, W=W, K=K, G=G,
                                   n_chunks=n_chunks, depth=depth)
        scratch = [
            pltpu.VMEM((depth, 1, W), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
        ]

    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks // G,),
            in_specs=[
                pl.BlockSpec((G, 2 * K, C), lambda g, bk, sl: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # x windows DMA'd by hand
            ],
            out_specs=pl.BlockSpec(
                (SLABS_PER_BLOCK, C),
                lambda g, bk, sl: (sl[g * G] // SLABS_PER_BLOCK - first_block,
                                   0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_slabs, C), packed.dtype),
            interpret=interpret,
        )(bucket, slab, packed, xp)


def sell_spmv_pallas(A: SELLMatrix, x: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """y = A @ x via the windowed-compare kernel — one pallas_call per
    pre-split part; the per-part outputs cover disjoint contiguous output
    blocks and concatenate.  f32 only (Mosaic has no f64; the kernel is
    traced with x64 disabled, so f64 operands would silently truncate)."""
    if A.dtype != jnp.float32:
        raise TypeError(f"SELL Pallas kernel is f32-only, got {A.dtype}")
    x = x.astype(A.dtype)
    xp = _pad_x(A, x).reshape(A.n_buckets, 1, A.W)
    n_slabs_total = A.n_rows_pad // C
    # decide x-residency here (reading the live module attribute so tests
    # can monkeypatch it) and pass it down as a static jit argument
    xres = (not _NO_XRES) and A.n_buckets * A.W * 4 <= _XRES_MAX_BYTES

    def cover(outs):
        y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        if y.shape[0] < n_slabs_total:
            # trailing blocks beyond the packed range (operator padded
            # after packing, e.g. to the solver's alignment) are zero
            y = jnp.pad(y, ((0, n_slabs_total - y.shape[0]), (0, 0)))
        return y

    outs = []
    for p, (n_chunks, first_block, n_blocks) in enumerate(A.parts):
        outs.append(_sell_call(
            A.bucket[p], A.slab[p], A.packed[p], xp,
            W=A.W, K=A.K, G=A.G, n_chunks=n_chunks,
            n_slabs=n_blocks * SLABS_PER_BLOCK,
            first_block=first_block, interpret=interpret, xres=xres,
        ))
    y = cover(outs)
    if A.n_dense_chunks:
        douts = []
        for p, (n_chunks, first_block, n_blocks) in enumerate(A.dense_parts):
            douts.append(_dense_call(
                A.dense_bucket[p], A.dense_slab[p], A.dense_vidx[p],
                A.dense_data[0], xp,
                W=A.W, n_chunks=n_chunks,
                n_slabs=n_blocks * SLABS_PER_BLOCK,
                first_block=first_block, interpret=interpret,
            ))
        y = y + cover(douts)
    return y.reshape(-1)[: A.n_rows]


# ---------------------------------------------------------------------------
# Double-float (two-fp32) SELL SpMV — the unstructured analog of the DIA
# df64 kernel (ops/pallas/df64_kernel.py): the mixed scheme's fp64 outer
# residual on SELL-routed matrices would otherwise run XLA's f64 gather
# (measured 1.16 s for ONE SpMV at 4.7M nnz — 40x the df64 kernel).
# Values ride as (hi, lo) f32 pairs (packed + packed_lo / dense_data +
# dense_lo sidecars); products use Dekker two_prod and the W-dimension
# contraction is a compensated two_sum tree over sublanes (no MXU — it
# cannot carry the error terms).
# ---------------------------------------------------------------------------

from gmres_tpu.ops.pallas.df64_kernel import (  # noqa: E402
    _df_add,
    _two_prod,
)


def _df_reduce_sublanes(ph, pl):
    """Compensated reduction of a (W, C) df64 pair over axis 0 -> (1, C)."""
    W = ph.shape[0]
    while W > 1:
        half = W // 2
        ph, pl = _df_add(ph[:half], pl[:half], ph[half:], pl[half:])
        W = half
    return ph, pl


def _sell_df64_kernel(bucket_ref, slab_ref, packed_ref, lo_ref, xh_ref,
                      xl_ref, yh_ref, yl_ref, *, W: int, K: int):
    g = pl.program_id(0)
    slab_g = slab_ref[g]
    blk = slab_g // SLABS_PER_BLOCK
    prev_blk = slab_ref[jnp.maximum(g - 1, 0)] // SLABS_PER_BLOCK
    is_first = jnp.logical_or(g == 0, blk != prev_blk)

    @pl.when(is_first)
    def _():
        yh_ref[...] = jnp.zeros_like(yh_ref)
        yl_ref[...] = jnp.zeros_like(yl_ref)

    buf = packed_ref[0]        # (2K, C): [vals_hi ; bitcast cols]
    vh = buf[:K]
    cols = jax.lax.bitcast_convert_type(buf[K:], jnp.int32)
    vl = lo_ref[0]             # (K, C)
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    dh = jnp.zeros((W, C), jnp.float32)
    dl = jnp.zeros((W, C), jnp.float32)
    for k in range(K):
        mask = iota == cols[k:k + 1, :]
        dh = dh + jnp.where(mask, vh[k:k + 1, :], 0.0)
        dl = dl + jnp.where(mask, vl[k:k + 1, :], 0.0)

    # operand window, sublane-oriented (one relayout per chunk)
    xh = xh_ref[0].reshape(W, 1)
    xl = xl_ref[0].reshape(W, 1)
    ph, pe = _two_prod(xh, dh)
    pe = pe + (xh * dl + xl * dh)
    sh, sl = _df_reduce_sublanes(ph, pe)  # (1, C)

    row = slab_g - blk * SLABS_PER_BLOCK
    ah = yh_ref[pl.ds(row, 1), :]
    al = yl_ref[pl.ds(row, 1), :]
    nh, nl = _df_add(ah, al, sh, sl)
    yh_ref[pl.ds(row, 1), :] = nh
    yl_ref[pl.ds(row, 1), :] = nl


def _sell_df64_dense_kernel(bucket_ref, slab_ref, vidx_ref, bh_ref, bl_ref,
                            xh_ref, xl_ref, yh_ref, yl_ref, *, W: int):
    g = pl.program_id(0)
    slab_g = slab_ref[g]
    blk = slab_g // SLABS_PER_BLOCK
    prev_blk = slab_ref[jnp.maximum(g - 1, 0)] // SLABS_PER_BLOCK
    is_first = jnp.logical_or(g == 0, blk != prev_blk)

    @pl.when(is_first)
    def _():
        yh_ref[...] = jnp.zeros_like(yh_ref)
        yl_ref[...] = jnp.zeros_like(yl_ref)

    dh = bh_ref[0]             # (W, C)
    dl = bl_ref[0]
    xh = xh_ref[0].reshape(W, 1)
    xl = xl_ref[0].reshape(W, 1)
    ph, pe = _two_prod(xh, dh)
    pe = pe + (xh * dl + xl * dh)
    sh, sl = _df_reduce_sublanes(ph, pe)

    row = slab_g - blk * SLABS_PER_BLOCK
    ah = yh_ref[pl.ds(row, 1), :]
    al = yl_ref[pl.ds(row, 1), :]
    nh, nl = _df_add(ah, al, sh, sl)
    yh_ref[pl.ds(row, 1), :] = nh
    yl_ref[pl.ds(row, 1), :] = nl


@functools.partial(
    jax.jit,
    static_argnames=("W", "K", "n_chunks", "n_slabs", "first_block",
                     "interpret"),
)
def _sell_df64_call(bucket, slab, packed, packed_lo, xh, xl, *, W, K,
                    n_chunks, n_slabs, first_block, interpret=False):
    kernel = functools.partial(_sell_df64_kernel, W=W, K=K)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, 2 * K, C), lambda g, bk, sl: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, C), lambda g, bk, sl: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W), lambda g, bk, sl: (bk[g], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W), lambda g, bk, sl: (bk[g], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(
                    (SLABS_PER_BLOCK, C),
                    lambda g, bk, sl: (sl[g] // SLABS_PER_BLOCK - first_block, 0),
                    memory_space=pltpu.VMEM,
                ),
            ) * 2,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((n_slabs, C), jnp.float32),) * 2,
            interpret=interpret,
        )(bucket, slab, packed, packed_lo, xh, xl)


@functools.partial(
    jax.jit,
    static_argnames=("W", "n_chunks", "n_slabs", "first_block", "interpret"),
)
def _sell_df64_dense_call(bucket, slab, vidx, blocks_hi, blocks_lo, xh, xl,
                          *, W, n_chunks, n_slabs, first_block,
                          interpret=False):
    kernel = functools.partial(_sell_df64_dense_kernel, W=W)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, W, C), lambda g, bk, sl, vi: (vi[g], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W, C), lambda g, bk, sl, vi: (vi[g], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W), lambda g, bk, sl, vi: (bk[g], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W), lambda g, bk, sl, vi: (bk[g], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(
                    (SLABS_PER_BLOCK, C),
                    lambda g, bk, sl, vi: (sl[g] // SLABS_PER_BLOCK - first_block, 0),
                    memory_space=pltpu.VMEM,
                ),
            ) * 2,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((n_slabs, C), jnp.float32),) * 2,
            interpret=interpret,
        )(bucket, slab, vidx, blocks_hi, blocks_lo, xh, xl)


def sell_spmv_df64(A: SELLMatrix, xh: jax.Array, xl: jax.Array,
                   interpret: bool | None = None):
    """(y_hi, y_lo) = A @ x in double-float for a df64-packed SELLMatrix
    (``sell_from_csr(..., df64=True)``).  ~2^-48 relative accuracy — the
    mixed scheme's fp64 outer residual for unstructured operators.

    ``interpret`` defaults by backend (same convention as df64_kernel /
    trisolve_kernel): off-TPU callers — e.g. condest's df64-SELL route
    under test — run the kernel in interpret mode instead of erroring."""
    if not A.packed_lo:
        raise TypeError("SELLMatrix was not packed with df64=True")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xh = _pad_x(A, xh.astype(jnp.float32)).reshape(A.n_buckets, 1, A.W)
    xl = _pad_x(A, xl.astype(jnp.float32)).reshape(A.n_buckets, 1, A.W)
    n_slabs_total = A.n_rows_pad // C

    def cover(outs):
        yh = jnp.concatenate([o[0] for o in outs], axis=0) if len(outs) > 1 else outs[0][0]
        yl = jnp.concatenate([o[1] for o in outs], axis=0) if len(outs) > 1 else outs[0][1]
        if yh.shape[0] < n_slabs_total:
            pad = ((0, n_slabs_total - yh.shape[0]), (0, 0))
            yh, yl = jnp.pad(yh, pad), jnp.pad(yl, pad)
        return yh, yl

    outs = []
    for p, (n_chunks, first_block, n_blocks) in enumerate(A.parts):
        outs.append(_sell_df64_call(
            A.bucket[p], A.slab[p], A.packed[p], A.packed_lo[p], xh, xl,
            W=A.W, K=A.K, n_chunks=n_chunks,
            n_slabs=n_blocks * SLABS_PER_BLOCK,
            first_block=first_block, interpret=interpret,
        ))
    yh, yl = cover(outs)
    if A.n_dense_chunks:
        bh = A.dense_data[0].astype(jnp.float32)
        bl = A.dense_lo[0]
        douts = []
        for p, (n_chunks, first_block, n_blocks) in enumerate(A.dense_parts):
            douts.append(_sell_df64_dense_call(
                A.dense_bucket[p], A.dense_slab[p], A.dense_vidx[p],
                bh, bl, xh, xl,
                W=A.W, n_chunks=n_chunks,
                n_slabs=n_blocks * SLABS_PER_BLOCK,
                first_block=first_block, interpret=interpret,
            ))
        dh, dl = cover(douts)
        from gmres_tpu.ops.pallas.df64_kernel import _df_add as dfa

        yh, yl = dfa(yh, yl, dh, dl)
    return (yh.reshape(-1)[: A.n_rows], yl.reshape(-1)[: A.n_rows])
