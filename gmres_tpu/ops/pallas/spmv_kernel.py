"""Pallas TPU kernel: fused DIA SpMV.

y[i] = sum_d data[d, i] * x[i + off_d]

The XLA formulation (``ops/dia.py:dia_spmv``) emits one shifted
slice + multiply + add per diagonal; XLA fuses most of it, but every
diagonal still re-reads its shifted window of ``x`` from HBM.  This kernel
makes the structure explicit: one grid pass over row blocks, the block's
``x`` window (block + halo of ``max|off|``) staged into VMEM ONCE, every
diagonal then a static in-VMEM slice + FMA.  Per element it moves
``D + 1`` inputs + 1 output instead of ``2D + 1`` streams — the
speed-of-light for this operation.

Replaces the reference's backend SpMV dispatch (``kernels_mkl.cpp:326-352``,
``kernels_cuda.cpp:576-614``) for banded/DIA operators on TPU.

The operand ``x`` is pre-padded by the host-side wrapper with ``pad`` zeros
on each side so the kernel's window loads never go out of bounds; padding
is rounded to the 128-lane register width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows processed per grid step.  Must be a multiple of the (8, 128) f32
# register tile; 64K elements keeps data blocks (D x 64K) plus the x window
# comfortably inside the ~16 MB of VMEM for D up to ~32.
_BLOCK = 64 * 1024
_LANES = 128


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _halo_pad(offsets, dtype) -> int:
    """Operand halo width: at least max|offset|, rounded so the manual DMA
    window (``block + 2*pad`` elements) stays a multiple of the 1-D Mosaic
    tile (1024 32-bit words; 2048 elements for 16-bit operands) — an
    unaligned memref_slice is a hard compile error at small shapes."""
    half_tile = 512 if jnp.dtype(dtype).itemsize >= 4 else 1024
    return _round_up(max(1, max(abs(o) for o in offsets)), half_tile)


def _dia_kernel_dma(data_ref, x_hbm_ref, y_ref, x_vmem, sem, *, offsets, pad, block):
    """Row block with explicit DMA of the x window (block + 2*pad) from HBM."""
    i = pl.program_id(0)
    start = i * block  # x_padded[start : start + block + 2*pad]
    dma = pltpu.make_async_copy(
        x_hbm_ref.at[pl.ds(start, block + 2 * pad)],
        x_vmem,
        sem,
    )
    dma.start()
    dma.wait()
    acc = data_ref[0, :] * x_vmem[pl.ds(pad + offsets[0], block)]
    for d, off in enumerate(offsets[1:], start=1):
        acc += data_ref[d, :] * x_vmem[pl.ds(pad + off, block)]
    y_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def _dia_spmv_dma(data, x_padded, offsets, interpret=False):
    D, n_pad = data.shape
    pad = (x_padded.shape[0] - n_pad) // 2
    block = min(_BLOCK, n_pad)
    grid = n_pad // block

    kernel = functools.partial(
        _dia_kernel_dma, offsets=offsets, pad=pad, block=block
    )
    # Mosaic requires i32 grid/index arithmetic; under jax_enable_x64 the
    # traced index_map values come out i64 and TPU compilation rejects the
    # lowered module.  The kernel itself is dtype-explicit, so tracing it
    # with x64 disabled changes nothing else.
    with jax.enable_x64(False):
        return _pallas_call(kernel, D, n_pad, pad, block, grid, data.dtype,
                            interpret)(data, x_padded)


def _pallas_call(kernel, D, n_pad, pad, block, grid, dtype, interpret):
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((D, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; DMA'd
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), dtype),
        scratch_shapes=[
            pltpu.VMEM((block + 2 * pad,), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )


def dia_spmv_pallas_windowed(data: jax.Array, xx: jax.Array, hl: int, hr: int,
                             offsets, interpret: bool = False) -> jax.Array:
    """y[i] = sum_d data[d, i] * xx[hl + i + off_d] for a haloed operand
    window ``xx = [left_halo | local | right_halo]`` (the distributed
    HaloDIA local block, ``parallel/halo.py``).  ``hl``/``hr`` are the halo
    widths actually present in ``xx``; the window is re-padded to the
    kernel's uniform halo of ``round_up(max|off|)`` so the same DMA kernel
    serves the sharded and single-device layouts."""
    D, r = data.shape
    block = min(_BLOCK, _round_up(r, _LANES * 8))
    n_pad = _round_up(r, block)
    pad = _halo_pad(offsets, data.dtype)
    assert pad >= hl and pad >= hr, (pad, hl, hr)

    if n_pad != r:
        data = jnp.pad(data, ((0, 0), (0, n_pad - r)))
    x_padded = jnp.pad(xx, (pad - hl, pad - hr + (n_pad - r)))
    y = _dia_spmv_dma(data, x_padded, tuple(offsets), interpret=interpret)
    return y[:r]


def dia_spmv_pallas(A, x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = A @ x for a DIAMatrix via the fused Pallas kernel.

    Pads/rounds on the fly (traced, so shapes are static under jit):
    rows are padded to the block multiple, the operand gets a halo of
    ``max|offset|`` (lane-rounded) zeros on each side.
    """
    n = A.n_rows
    x = x.astype(A.data.dtype)

    block = min(_BLOCK, _round_up(n, _LANES * 8))
    n_pad = _round_up(n, block)
    pad = _halo_pad(A.offsets, A.data.dtype)

    data = A.data
    if n_pad != n:
        data = jnp.pad(data, ((0, 0), (0, n_pad - n)))
    x_padded = jnp.pad(x, (pad, pad + (n_pad - n)))

    y = _dia_spmv_dma(data, x_padded, tuple(A.offsets), interpret=interpret)
    return y[:n]
