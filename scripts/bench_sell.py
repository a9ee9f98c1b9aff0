#!/usr/bin/env python3
"""TPU benchmark: SELL windowed-compare SpMV vs the XLA CSR fallback on a
matrix `dia.from_csr` rejects (VERDICT item 1 'done' criterion: >= 1e9
nnz/s on such a matrix).

Matrix: unstructured-mesh-like pattern — each row has ~`avg` off-diagonal
entries at random offsets within +-`spread` (thousands of distinct
diagonals => DIA refuses; bounded locality => SELL packs well, as any
RCM-reordered real matrix would).

Measured inside a data-dependent fori chain with a value fetch as the
barrier (see memory: block_until_ready lies on axon).
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_matrix(n, avg=6, spread=1024, seed=0):
    from gmres_tpu.sparse import csr_from_coo

    rng = np.random.default_rng(seed)
    nnz_off = n * avg
    rows = np.repeat(np.arange(n, dtype=np.int64), avg)
    offs = rng.integers(-spread, spread + 1, size=nnz_off)
    cols = np.clip(rows + offs, 0, n - 1)
    rows = np.concatenate([rows, np.arange(n, dtype=np.int64)])
    cols = np.concatenate([cols, np.arange(n, dtype=np.int64)])
    vals = rng.standard_normal(rows.shape[0])
    vals[-n:] = avg + 1.0  # diagonally dominant
    return csr_from_coo(rows, cols, vals, n_rows=n)


def bench_loop(spmv_fn, x0, iters):
    @jax.jit
    def run(x):
        def body(i, x):
            y = spmv_fn(x + i * 1e-12)
            return y / jnp.sqrt(jnp.sum(y * y))

        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x0)
    _ = float(np.asarray(out)[0])  # compile + warm
    t0 = time.perf_counter()
    out = run(x0)
    _ = float(np.asarray(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--avg", type=int, default=6)
    ap.add_argument("--spread", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    from gmres_tpu.ops.dia import from_csr
    from gmres_tpu.ops.sell import sell_from_csr
    from gmres_tpu.ops.spmv import spmv

    t0 = time.perf_counter()
    A = build_matrix(args.n, args.avg, args.spread)
    print(f"matrix: n={A.n_rows:,} nnz={A.nnz:,} built {time.perf_counter()-t0:.1f}s",
          flush=True)
    assert from_csr(A) is None, "DIA accepted it — wrong test matrix"

    t0 = time.perf_counter()
    S = sell_from_csr(A)
    assert S is not None, "SELL cost gate refused"
    print(f"SELL: W={S.W} K={S.K} chunks={S.n_chunks} parts={len(S.parts)} "
          f"slots/nnz={S.n_chunks*128*S.K/S.nnz:.2f} "
          f"packed {time.perf_counter()-t0:.1f}s", flush=True)

    S32 = jax.device_put(S.astype(jnp.float32))
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(args.n),
                     dtype=jnp.float32)

    # correctness vs host
    y_ref = A.to_scipy() @ np.asarray(x0, dtype=np.float64)
    from gmres_tpu.ops.pallas.sell_kernel import sell_spmv_pallas

    y = np.asarray(sell_spmv_pallas(S32, x0))
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    print(f"kernel vs host rel err: {rel:.2e}", flush=True)
    assert rel < 1e-5

    dt = bench_loop(lambda x: sell_spmv_pallas(S32, x), x0, args.iters)
    print(f"SELL pallas: {dt*1e3:.3f} ms/spmv  {A.nnz/dt/1e9:.3f} Gnnz/s",
          flush=True)

    if not args.skip_xla:
        A32 = jax.device_put(A.astype(jnp.float32))
        dt = bench_loop(lambda x: spmv(A32, x, use_pallas=False), x0,
                        max(4, args.iters // 10))
        print(f"CSR XLA:     {dt*1e3:.3f} ms/spmv  {A.nnz/dt/1e9:.3f} Gnnz/s",
              flush=True)


if __name__ == "__main__":
    main()
