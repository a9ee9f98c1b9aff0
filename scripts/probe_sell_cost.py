#!/usr/bin/env python3
"""Attribute the SELL kernel's per-chunk fixed cost (~280ns measured):
time kernel variants with pieces removed on the same packed mesh matrix.
Wrong-result variants are timing-only.
"""
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "scripts")
from bench_sell import build_mesh_matrix  # noqa: E402

from gmres_tpu.ops.sell import C, SLABS_PER_BLOCK, sell_from_csr  # noqa: E402
from gmres_tpu.ops.sell import _pad_x  # noqa: E402

W = 512
K = 4


def make_kernel(variant):
    def kern(bucket_ref, slab_ref, vals_ref, cols_ref, x_ref, y_ref):
        g = pl.program_id(0)
        slab_g = slab_ref[g]
        blk = slab_g // SLABS_PER_BLOCK
        prev_blk = slab_ref[jnp.maximum(g - 1, 0)] // SLABS_PER_BLOCK
        is_first = jnp.logical_or(g == 0, blk != prev_blk)

        @pl.when(is_first)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        vals = vals_ref[0]
        cols = cols_ref[0]
        xw = x_ref[0]
        if variant == "noop":
            y_row = vals[0:1, :]
        elif variant == "no_densify":
            # matvec on a fixed dense tile (reuse vals broadcast) — no loop
            dense = jnp.broadcast_to(vals[0:1, :], (W, C))
            y_row = jnp.dot(xw, dense, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        elif variant == "no_matvec":
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
            dense = jnp.zeros((W, C), vals.dtype)
            for k in range(K):
                dense = dense + jnp.where(iota == cols[k:k + 1, :],
                                          vals[k:k + 1, :],
                                          jnp.zeros((), vals.dtype))
            y_row = jnp.sum(dense[0:8, :], axis=0, keepdims=True)
        elif variant == "matvec_default":
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
            dense = jnp.zeros((W, C), vals.dtype)
            for k in range(K):
                dense = dense + jnp.where(iota == cols[k:k + 1, :],
                                          vals[k:k + 1, :],
                                          jnp.zeros((), vals.dtype))
            y_row = jnp.dot(xw, dense, preferred_element_type=jnp.float32)
        else:  # full
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
            dense = jnp.zeros((W, C), vals.dtype)
            for k in range(K):
                dense = dense + jnp.where(iota == cols[k:k + 1, :],
                                          vals[k:k + 1, :],
                                          jnp.zeros((), vals.dtype))
            y_row = jnp.dot(xw, dense, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        row = slab_g - blk * SLABS_PER_BLOCK
        y_ref[pl.ds(row, 1), :] += y_row.astype(vals.dtype)

    return kern


def run_variant(S, xp, variant):
    (n_chunks, first_block, n_blocks) = S.parts[0]
    assert len(S.parts) == 1

    @functools.partial(jax.jit, static_argnames=())
    def go(bucket, slab, vals, cols, xp):
        with jax.enable_x64(False):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec((1, K, C), lambda g, bk, sl: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, K, C), lambda g, bk, sl: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, W), lambda g, bk, sl: (bk[g], 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (SLABS_PER_BLOCK, C),
                    lambda g, bk, sl: (sl[g] // SLABS_PER_BLOCK, 0),
                    memory_space=pltpu.VMEM,
                ),
            )
            return pl.pallas_call(
                make_kernel(variant),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (n_blocks * SLABS_PER_BLOCK, C), jnp.float32),
            )(bucket, slab, vals, cols, xp)

    args = (S.bucket[0], S.slab[0], S.data[0], S.cols[0], xp)
    out = go(*args)
    _ = float(np.asarray(out)[0, 0])
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out = go(S.bucket[0], S.slab[0], S.data[0], S.cols[0],
                 xp + i * 1e-12)
    _ = float(np.asarray(out)[0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{variant:16s}: {dt*1e3:.3f} ms  {dt/n_chunks*1e9:.0f} ns/chunk",
          flush=True)


def main():
    import gmres_tpu.ops.sell as sm
    sm.MAX_CHUNKS_PER_CALL = 1 << 20  # single part for the probe
    A = build_mesh_matrix(1 << 20)
    S = sell_from_csr(A, W=W, K=K, dense_fill_min=1.0)
    S = jax.device_put(S.astype(jnp.float32))
    print(f"chunks={S.n_chunks}", flush=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(A.n_rows),
                    dtype=jnp.float32)
    xp = _pad_x(S, x).reshape(S.n_buckets, 1, S.W)
    for variant in ("noop", "no_densify", "no_matvec", "matvec_default",
                    "full"):
        run_variant(S, xp, variant)


if __name__ == "__main__":
    main()
