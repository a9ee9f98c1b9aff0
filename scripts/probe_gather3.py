#!/usr/bin/env python3
"""Targeted probe for the unstructured-SpMV kernel design (VERDICT item 1).

Questions:
  1. Does Mosaic dynamic_gather (take_along_axis) support an operand whose
     gather axis is wider than 128 lanes (gather across vector registers)?
  2. Does it support idx shape != operand shape along the gather axis
     (out (8,K) from operand (8,W))?
  3. In-loop throughput (Gelem/s) for the SpMV-shaped gathers:
       axis=1, operand (8, W) broadcast window, idx (8, K)
       axis=0, operand (S, 128), idx (P, 128)   [residue-constrained]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 50


def timed(run, x, idx, n_el):
    out = run(x, idx)
    val = np.asarray(out)  # fetch = barrier
    t0 = time.perf_counter()
    out = run(x, idx)
    _ = np.asarray(out)[0, 0]
    dt = (time.perf_counter() - t0) / REPS
    return dt, out


def lane_gather(W, K, S=8):
    """axis=1: out[s,k] = x[s, idx[s,k]]; operand (S,W), idx (S,K)."""

    def kern(x_ref, idx_ref, out_ref):
        x = x_ref[...]
        idx = idx_ref[...]

        def body(i, acc):
            g = jnp.take_along_axis(x + acc * 1e-30, idx, axis=1)
            return acc + g[0, 0]

        acc = jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
        out_ref[...] = jnp.take_along_axis(x, idx, axis=1) + acc * 1e-30

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, K), jnp.float32),
        )(x, idx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S, W)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, size=(S, K)), dtype=jnp.int32)
    try:
        dt, out = timed(run, x, idx, S * K)
        want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
        ok = bool(np.allclose(np.asarray(out), want, atol=1e-5))
        print(f"lane_gather W={W} K={K} S={S}: ok={ok} {dt*1e6:.1f} us "
              f"{S*K/dt/1e9:.2f} Gelem/s", flush=True)
    except Exception as e:
        print(f"lane_gather W={W} K={K} S={S}: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


def sublane_gather(S, P):
    """axis=0: out[p,l] = x[idx[p,l], l]; operand (S,128), idx (P,128)."""

    def kern(x_ref, idx_ref, out_ref):
        x = x_ref[...]
        idx = idx_ref[...]

        def body(i, acc):
            g = jnp.take_along_axis(x + acc * 1e-30, idx, axis=0)
            return acc + g[0, 0]

        acc = jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
        out_ref[...] = jnp.take_along_axis(x, idx, axis=0) + acc * 1e-30

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, 128), jnp.float32),
        )(x, idx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S, 128)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, size=(P, 128)), dtype=jnp.int32)
    try:
        dt, out = timed(run, x, idx, P * 128)
        want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
        ok = bool(np.allclose(np.asarray(out), want, atol=1e-5))
        print(f"sublane_gather S={S} P={P}: ok={ok} {dt*1e6:.1f} us "
              f"{P*128/dt/1e9:.2f} Gelem/s", flush=True)
    except Exception as e:
        print(f"sublane_gather S={S} P={P}: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "lane"):
        lane_gather(W=128, K=128)
        lane_gather(W=512, K=512)
        lane_gather(W=2048, K=128)
    if which in ("all", "sublane"):
        sublane_gather(S=512, P=512)
        sublane_gather(S=8192, P=2048)
