#!/usr/bin/env python3
"""Probe the mechanisms the SELL SpMV kernel needs:
  1. Large scalar-prefetch arrays (SMEM capacity at ~1MB).
  2. HBM -> SMEM DMA of an int32 meta slice, scalar read, then use as a
     dynamic DMA address into x.
  3. Scalar read directly from a VMEM-DMA'd meta buffer.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe1_prefetch(n_chunks=262144):
    """Scalar-prefetch a (n_chunks,) i32 array; index_map reads it."""
    G = 64

    def kern(meta_ref, x_ref, out_ref):
        g = pl.program_id(0)
        out_ref[...] = x_ref[...] + meta_ref[g].astype(jnp.float32)

    @jax.jit
    def run(meta, x):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[pl.BlockSpec((8, 128), lambda g, m: (m[g], 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda g, m: (g, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
        )(meta, x)

    rng = np.random.default_rng(0)
    meta = jnp.asarray(rng.integers(0, 4, size=n_chunks), dtype=jnp.int32)
    x = jnp.asarray(rng.standard_normal((32 * 8, 128)), dtype=jnp.float32)
    try:
        out = run(meta, x)
        got = np.asarray(out)
        want0 = np.asarray(x)[int(meta[0]) * 8:(int(meta[0]) + 1) * 8] + float(meta[0])
        ok = np.allclose(got[:8], want0)
        print(f"prefetch({n_chunks}): ok={ok}", flush=True)
    except Exception as e:
        print(f"prefetch({n_chunks}): FAIL {type(e).__name__}: {str(e)[:250]}",
              flush=True)


def probe2_smem_dma():
    """DMA an i32 meta slice HBM->SMEM, read a scalar, DMA x window by it."""
    W = 256

    def kern(meta_hbm, x_hbm, out_ref, meta_smem, xw, sem0, sem1):
        g = pl.program_id(0)
        d0 = pltpu.make_async_copy(meta_hbm.at[pl.ds(g * 4, 4)], meta_smem, sem0)
        d0.start()
        d0.wait()
        w0 = meta_smem[0]
        d1 = pltpu.make_async_copy(x_hbm.at[pl.ds(w0, W)], xw, sem1)
        d1.start()
        d1.wait()
        out_ref[...] = xw[...].reshape(2, 128)

    @jax.jit
    def run(meta, x):
        return pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((2, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((4,), jnp.int32),
                pltpu.VMEM((W,), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(meta, x)

    rng = np.random.default_rng(0)
    meta = jnp.asarray([128, 0, 0, 0, 384, 0, 0, 0, 0, 0, 0, 0, 512, 0, 0, 0],
                       dtype=jnp.int32)
    x = jnp.asarray(rng.standard_normal(2048), dtype=jnp.float32)
    try:
        out = run(meta, x)
        got = np.asarray(out)
        ok = np.allclose(got[:2].reshape(-1), np.asarray(x)[128:128 + 256])
        ok &= np.allclose(got[2:4].reshape(-1), np.asarray(x)[384:384 + 256])
        print(f"smem_dma: ok={ok}", flush=True)
    except Exception as e:
        print(f"smem_dma: FAIL {type(e).__name__}: {str(e)[:250]}", flush=True)


def probe3_vmem_scalar():
    """Read a scalar from a VMEM buffer and use it as a DMA address."""
    W = 256

    def kern(meta_hbm, x_hbm, out_ref, meta_vmem, xw, sem0, sem1):
        g = pl.program_id(0)
        d0 = pltpu.make_async_copy(meta_hbm.at[pl.ds(g * 8, 8)], meta_vmem, sem0)
        d0.start()
        d0.wait()
        w0 = meta_vmem[0]
        d1 = pltpu.make_async_copy(x_hbm.at[pl.ds(w0, W)], xw, sem1)
        d1.start()
        d1.wait()
        out_ref[...] = xw[...].reshape(2, 128)

    @jax.jit
    def run(meta, x):
        return pl.pallas_call(
            kern,
            grid=(2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((2, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((8,), jnp.int32),
                pltpu.VMEM((W,), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(meta, x)

    rng = np.random.default_rng(0)
    meta = jnp.asarray([128] + [0] * 7 + [512] + [0] * 7, dtype=jnp.int32)
    x = jnp.asarray(rng.standard_normal(2048), dtype=jnp.float32)
    try:
        out = run(meta, x)
        got = np.asarray(out)
        ok = np.allclose(got[:2].reshape(-1), np.asarray(x)[128:384])
        ok &= np.allclose(got[2:4].reshape(-1), np.asarray(x)[512:768])
        print(f"vmem_scalar: ok={ok}", flush=True)
    except Exception as e:
        print(f"vmem_scalar: FAIL {type(e).__name__}: {str(e)[:250]}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "1"):
        probe1_prefetch(1024)
        probe1_prefetch(262144)
    if which in ("all", "2"):
        probe2_smem_dma()
    if which in ("all", "3"):
        probe3_vmem_scalar()
