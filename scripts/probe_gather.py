#!/usr/bin/env python3
"""Probe: which gather formulations does Mosaic (Pallas TPU) support, and
how fast are they?  Decides the design of the unstructured-SpMV kernel
(VERDICT item 1: block-ELL / row-blocked SpMV for matrices DIA rejects).

Candidates:
  a) jnp.take along the last (lane) axis of a VMEM-resident 2D buffer
  b) advanced indexing x_ref[idx] with a vector of indices
  c) jax.lax.gather via take_along_axis
  d) one-hot matmul gather (MXU) as a baseline that definitely works
"""
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, iters=20):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*(a if j else a + (i % 3) * 0 for j, a in enumerate(args)))
    val = float(np.asarray(out).reshape(-1)[0])  # fetch = real barrier
    dt = (time.perf_counter() - t0) / iters
    return dt, val


def main():
    n = 512 * 1024          # x size (VMEM-resident: 2 MB fp32)
    E = 4 * 1024 * 1024     # gathered elements
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, size=E), dtype=jnp.int32)

    want = np.asarray(x)[np.asarray(idx)]

    # ---- (a) take along lanes of 2D x in VMEM
    def kern_take(x_ref, idx_ref, out_ref):
        xi = x_ref[...]            # (n//128, 128)
        ii = idx_ref[...]          # (E//128, 128)
        flat = xi.reshape(-1)
        out_ref[...] = jnp.take(flat, ii, axis=0)

    @jax.jit
    def take_pallas(x, idx):
        return pl.pallas_call(
            kern_take,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E // 128, 128), jnp.float32),
        )(x.reshape(-1, 128), idx.reshape(-1, 128))

    for name, fn in [("take(flat)", take_pallas)]:
        try:
            dt, _ = bench(fn, x, idx)
            got = np.asarray(fn(x, idx)).reshape(-1)
            ok = np.allclose(got, want)
            gbs = E * (4 + 4 + 4) / dt / 1e9
            print(f"{name}: ok={ok} {dt*1e3:.3f} ms  {E/dt/1e9:.2f} Gelem/s  ~{gbs:.0f} GB/s")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")

    # ---- (b) dynamic gather via take_along_axis on last axis
    def kern_taa(x_ref, idx_ref, out_ref):
        # gather within each 128-lane row: only lane-local
        out_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)

    @jax.jit
    def taa_pallas(x, idx_lane):
        return pl.pallas_call(
            kern_taa,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.float32),
        )(x.reshape(-1, 128), idx_lane)

    idx_lane = jnp.asarray(rng.integers(0, 128, size=(n // 128, 128)),
                           dtype=jnp.int32)
    try:
        dt, _ = bench(taa_pallas, x, idx_lane)
        got = np.asarray(taa_pallas(x, idx_lane))
        want_l = np.take_along_axis(np.asarray(x).reshape(-1, 128),
                                    np.asarray(idx_lane), axis=1)
        ok = np.allclose(got, want_l)
        print(f"take_along_axis(lane): ok={ok} {dt*1e3:.3f} ms  {n/dt/1e9:.2f} Gelem/s")
    except Exception as e:
        print(f"take_along_axis(lane): FAIL {type(e).__name__}: {str(e)[:300]}")

    # ---- (c) gather rows: x2d[idx_row, :] row gather (sublane gather)
    def kern_rowg(x_ref, idx_ref, out_ref):
        out_ref[...] = x_ref[idx_ref[...], :]

    @jax.jit
    def rowg_pallas(x2d, idx_row):
        return pl.pallas_call(
            kern_rowg,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
        )(x2d, idx_row)

    x2d = x.reshape(-1, 128)[:4096]
    idx_row = jnp.asarray(rng.integers(0, 4096, size=(1024,)), dtype=jnp.int32)
    try:
        dt, _ = bench(rowg_pallas, x2d, idx_row)
        got = np.asarray(rowg_pallas(x2d, idx_row))
        want_r = np.asarray(x2d)[np.asarray(idx_row)]
        ok = np.allclose(got, want_r)
        print(f"row-gather: ok={ok} {dt*1e3:.3f} ms")
    except Exception as e:
        print(f"row-gather: FAIL {type(e).__name__}: {str(e)[:300]}")

    # ---- XLA baseline outside pallas
    @jax.jit
    def xla_take(x, idx):
        return jnp.take(x, idx)

    dt, _ = bench(xla_take, x, idx)
    print(f"XLA take (outside pallas): {dt*1e3:.3f} ms  {E/dt/1e9:.3f} Gelem/s")


if __name__ == "__main__":
    main()
