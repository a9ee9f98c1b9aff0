#!/usr/bin/env python3
"""Recalibrate the SELL (W, K) autotune cost model on the CURRENT device.

The autotune in ``ops/sell.py`` scores candidates with a per-chunk cost
``fixed_ns + ns_per_lane*W + ns_per_slot_byte*slot_bytes`` whose default
constants were measured on TPU v5e.  On a different TPU generation run

    python scripts/calibrate_sell_cost.py sell_cost.json
    export GMRES_TPU_SELL_CALIBRATION=$PWD/sell_cost.json

This times the REAL SELL SpMV across a (W, K) grid on a mesh-class
matrix, least-squares fits the three constants against the model, prints
the fit residuals, and writes the JSON the autotune reads.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "scripts")
from bench_sell import build_mesh_matrix  # noqa: E402

from gmres_tpu.ops.sell import C, sell_from_csr, sell_spmv  # noqa: E402


def time_config(A, W, K, iters=20):
    S = sell_from_csr(A, W=W, K=K)
    if S is None:
        return None
    S = jax.device_put(S.astype(jnp.float32))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(A.n_rows),
                    dtype=jnp.float32)
    # in-device fori_loop chain (y feeds the next SpMV): NO per-iteration
    # dispatch or host sync — the round-3 python-loop timing folded ~10 us
    # of tunnel dispatch into every chunk-cost sample and inflated the
    # fitted constants
    from gmres_tpu.cli.bench_kernels import device_loop_op, time_op

    run = device_loop_op(lambda S_, v: sell_spmv(S_, v)[: A.n_rows], iters)
    dt = time_op(run, (S, x), iters)
    n_chunks = sum(p[0] for p in S.parts)
    return dt, n_chunks


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "sell_cost.json"
    A = build_mesh_matrix(1 << 20)
    rows_feat, times = [], []
    for W in (128, 256, 512, 1024):
        for K in (4, 8, 16):
            r = time_config(A, W, K)
            if r is None:
                continue
            dt, n_chunks = r
            per_chunk_ns = dt / n_chunks * 1e9
            slot_bytes = 2 * K * C * 4
            rows_feat.append([1.0, float(W), float(slot_bytes)])
            times.append(per_chunk_ns)
            print(f"W={W:5d} K={K:3d}: {dt*1e3:7.3f} ms, {n_chunks:7d} "
                  f"chunks, {per_chunk_ns:7.1f} ns/chunk", flush=True)
    X = np.asarray(rows_feat)
    y = np.asarray(times)
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    fit = {"fixed_ns": max(0.0, float(coef[0])),
           "ns_per_lane": max(0.0, float(coef[1])),
           "ns_per_slot_byte": max(0.0, float(coef[2]))}
    resid = X @ coef - y
    print(f"fit: {fit}")
    print(f"residual rms {float(np.sqrt(np.mean(resid**2))):.1f} ns "
          f"(mean cost {float(np.mean(y)):.1f} ns)")
    with open(out_path, "w") as f:
        json.dump(fit, f, indent=1)
    print(f"wrote {out_path}; export GMRES_TPU_SELL_CALIBRATION to use it")


if __name__ == "__main__":
    main()
