#!/usr/bin/env python3
"""Probe the real scalar-prefetch (SMEM) capacity of the SELL kernel.

MAX_CHUNKS_PER_CALL bounds the chunks per pallas_call because the two
int32 steering arrays (bucket, slab) are scalar-prefetch operands living
in SMEM.  The 32768 default (256 KB) was a guess; the per-shard
distributed pack needs a SINGLE part, so the cap directly limits shard
size (a 1M-row mesh3d shard is ~37K chunks).  This compiles+runs the
real kernel at growing chunk counts and reports the first failure.

Run with the cap raised so the pack doesn't pre-split:
    GMRES_TPU_SELL_MAX_CHUNKS=300000 python scripts/probe_sell_smem.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gmres_tpu.io.synth import unstructured_mesh
from gmres_tpu.ops.sell import sell_from_csr
from gmres_tpu.ops.pallas.sell_kernel import sell_spmv_pallas
from gmres_tpu.ops.spmv import spmv


def main():
    # chunk count scales with rows; W/K pinned so the series is clean
    for n in (256 * 1024, 512 * 1024, 1024 * 1024, 2 * 1024 * 1024):
        A = unstructured_mesh(n, run=8, seed=1)
        S = sell_from_csr(A, W=512, K=8)
        if S is None:
            print(f"n={n:,}: pack refused")
            continue
        parts = len(S.parts)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(A.n_rows),
                        jnp.float32)
        try:
            y = np.asarray(sell_spmv_pallas(S.astype(jnp.float32), x))
            ref = np.asarray(spmv(A, jnp.asarray(
                np.asarray(x, np.float64))))
            err = (np.linalg.norm(y - ref.astype(np.float32))
                   / max(np.linalg.norm(ref), 1e-30))
            print(f"n={n:,}: chunks={S.n_chunks} parts={parts} "
                  f"OK rel_err={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"n={n:,}: chunks={S.n_chunks} parts={parts} "
                  f"FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
