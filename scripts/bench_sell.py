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


def build_matrix(n, avg=6, spread=1024, seed=0, cluster=1):
    """Unstructured pattern with per-row locality.

    ``cluster=1``: every off-diagonal at an independent random offset in
    +-spread (adversarial — no two entries share a 128-window).
    ``cluster=c``: entries come in runs of ``c`` consecutive columns
    (FEM/mesh-like coupling blocks, the shape RCM produces on the paper's
    suite matrices).  Either way the pattern has thousands of distinct
    diagonals, so ``dia.from_csr`` rejects it.
    """
    from gmres_tpu.sparse import csr_from_coo

    rng = np.random.default_rng(seed)
    n_clusters = max(1, avg // cluster)
    rows = np.repeat(np.arange(n, dtype=np.int64), n_clusters)
    centers = rng.integers(-spread, spread + 1, size=rows.shape[0])
    rows = np.repeat(rows, cluster)
    offs = np.repeat(centers, cluster) + np.tile(
        np.arange(cluster, dtype=np.int64), centers.shape[0]
    )
    cols = np.clip(rows + offs, 0, n - 1)
    diag_r = np.arange(n, dtype=np.int64)
    rows = np.concatenate([rows, diag_r])
    cols = np.concatenate([cols, diag_r])
    vals = rng.standard_normal(rows.shape[0])
    vals[-n:] = avg + 1.0  # diagonally dominant
    return csr_from_coo(rows, cols, vals, n_rows=n)


def build_mesh_matrix(n, nx=1024, jitter=16, run=3, seed=0):
    """Jittered-stencil 'unstructured mesh': row i couples to runs of
    ``run`` columns at i-1 and at i +- (nx + j(i)) with per-row random
    jitter — what an RCM-ordered FEM/mesh matrix looks like: smooth
    per-row offsets (slab-coherent buckets) but far too many distinct
    diagonals for DIA (fill-gate rejects)."""
    from gmres_tpu.sparse import csr_from_coo

    rng = np.random.default_rng(seed)
    i = np.arange(n, dtype=np.int64)
    j_up = rng.integers(-jitter, jitter + 1, size=n)
    j_dn = rng.integers(-jitter, jitter + 1, size=n)
    base = [i - 1 + k for k in range(run)]
    up = [i - nx + j_up + k for k in range(run)]
    dn = [i + nx + j_dn + k for k in range(run)]
    cols = np.concatenate(base + up + dn)
    rows = np.tile(i, 3 * run)
    cols = np.clip(cols, 0, n - 1)
    vals = rng.standard_normal(rows.shape[0])
    # dominant diagonal for solver-friendliness
    diag = np.abs(cols - rows) == 0
    rows = np.concatenate([rows, i])
    cols = np.concatenate([cols, i])
    vals = np.concatenate([vals, np.full(n, 3.0 * run + 1.0)])
    return csr_from_coo(rows, cols, vals, n_rows=n)


def bench_loop(spmv_fn, A, x0, iters):
    # A must be a jit ARGUMENT: closing over it would bake the operator
    # arrays into the HLO as constants (hundreds of MB through the remote
    # compile service)
    @jax.jit
    def run(A, x):
        def body(i, x):
            y = spmv_fn(A, x + i * 1e-12)
            return y / jnp.sqrt(jnp.sum(y * y))

        return jax.lax.fori_loop(0, iters, body, x)

    out = run(A, x0)
    _ = float(np.asarray(out)[0])  # compile + warm
    t0 = time.perf_counter()
    out = run(A, x0)
    _ = float(np.asarray(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--avg", type=int, default=6)
    ap.add_argument("--spread", type=int, default=1024)
    ap.add_argument("--cluster", type=int, default=1)
    ap.add_argument("--mesh", action="store_true",
                    help="jittered-stencil mesh matrix instead of random")
    ap.add_argument("--run", type=int, default=3,
                    help="mesh coupling-run width (3 -> ~10 nnz/row like "
                         "2D FEM, 8 -> ~25 like 3D FEM/cage)")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--dense-min", type=float, default=0.125,
                    help="dense fill threshold (1.0 disables dense chunks)")
    ap.add_argument("--W", type=int, default=None)
    ap.add_argument("--K", type=int, default=None)
    args = ap.parse_args()

    from gmres_tpu.ops.dia import from_csr
    from gmres_tpu.ops.sell import sell_from_csr
    from gmres_tpu.ops.spmv import spmv

    t0 = time.perf_counter()
    if args.mesh:
        A = build_mesh_matrix(args.n, jitter=args.spread // 32 or 8,
                              run=args.run)
    else:
        A = build_matrix(args.n, args.avg, args.spread, cluster=args.cluster)
    print(f"matrix: n={A.n_rows:,} nnz={A.nnz:,} built {time.perf_counter()-t0:.1f}s",
          flush=True)
    assert from_csr(A) is None, "DIA accepted it — wrong test matrix"

    t0 = time.perf_counter()
    S = sell_from_csr(A, W=args.W, K=args.K, dense_fill_min=args.dense_min)
    assert S is not None, "SELL cost gate refused"
    print(f"SELL: W={S.W} K={S.K} chunks={S.n_chunks} dense={S.n_dense_chunks} "
          f"parts={len(S.parts)} slots/nnz={S.n_chunks*128*S.K/S.nnz:.2f} "
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

    dt = bench_loop(lambda a, x: sell_spmv_pallas(a, x), S32, x0, args.iters)
    print(f"SELL pallas: {dt*1e3:.3f} ms/spmv  {A.nnz/dt/1e9:.3f} Gnnz/s",
          flush=True)

    if not args.skip_xla:
        A32 = jax.device_put(A.astype(jnp.float32))
        dt = bench_loop(lambda a, x: spmv(a, x, use_pallas=False), A32, x0,
                        max(4, args.iters // 10))
        print(f"CSR XLA:     {dt*1e3:.3f} ms/spmv  {A.nnz/dt/1e9:.3f} Gnnz/s",
              flush=True)


if __name__ == "__main__":
    main()
