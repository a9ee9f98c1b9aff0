#!/usr/bin/env python3
"""Where does the batched multi-RHS amortization go? (round-4 VERDICT
weak item 8: batch-8 gained 2.6x, not ~8x.)

Decomposes the gap at convdiff@1M by timing the two bandwidth-bound
per-iteration primitives standalone, single-RHS vs vmapped batch-B, on
the XLA paths the batched solver actually uses (use_pallas=False):

  * DIA SpMV:      y = A x           (reads D*n matrix data + n operand)
  * CGS gram+upd:  u = V w; w -= V u (reads (m+1)*n basis twice)

If an op's batch-B time is ~B x its single time, it amortizes nothing
(the matrix/basis is re-read per lane — XLA did not hoist the shared
operand); if it is ~1x, amortization is perfect.  The solver-level gain
is bounded by the mix of these plus the vmap lockstep tax (all lanes run
until the slowest converges).
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.ops.dia import dia_spmv, from_csr

    B_SIZES = (1, 2, 4, 8)
    m1 = 31
    A = convection_diffusion_2d(1024, beta=2.0)
    dia = jax.device_put(from_csr(A).astype(jnp.float32))
    n = A.n_rows
    rng = np.random.default_rng(0)
    print(f"n={n:,} nnz={A.nnz:,} D={len(dia.offsets)} m+1={m1}", flush=True)

    # --- SpMV: single vs vmapped batch (XLA path, as solve_batched) ---
    spmv1 = jax.jit(lambda x: dia_spmv(dia, x, use_pallas=False))
    spmvB = jax.jit(jax.vmap(lambda x: dia_spmv(dia, x, use_pallas=False)))
    t1 = None
    for Bs in B_SIZES:
        X = jnp.asarray(rng.standard_normal((Bs, n)), jnp.float32)
        t = timeit(spmv1, X[0]) if Bs == 1 else timeit(spmvB, X)
        if Bs == 1:
            t1 = t
        eff = t1 * Bs / t
        print(f"spmv xla  B={Bs}: {t*1e3:8.3f} ms  amortization "
              f"{eff:.2f}x of ideal {Bs}x", flush=True)

    # --- CGS step: u = V w ; w' = w - V^T u  (basis read twice) ---
    V = jnp.asarray(rng.standard_normal((m1, n)), jnp.float32)

    def cgs1(w):
        u = V @ w
        return w - V.T @ u

    cgsB = jax.jit(jax.vmap(cgs1))
    cgs1 = jax.jit(cgs1)
    for Bs in B_SIZES:
        W = jnp.asarray(rng.standard_normal((Bs, n)), jnp.float32)
        t = timeit(cgs1, W[0]) if Bs == 1 else timeit(cgsB, W)
        if Bs == 1:
            t1 = t
        eff = t1 * Bs / t
        print(f"cgs  xla  B={Bs}: {t*1e3:8.3f} ms  amortization "
              f"{eff:.2f}x of ideal {Bs}x", flush=True)

    # --- matrix-data amortization ceiling ---
    # per-iteration bytes, single RHS: matrix D*n*4 + operand/result 2n*4
    # + basis reads 2*m1*n*4; of these only the matrix D*n*4 is shared
    # across lanes.  Ideal batch-B speedup = B*(total1)/(shared + B*rest).
    D = len(dia.offsets)
    shared = D * n * 4
    per_lane = 2 * n * 4 + 2 * m1 * n * 4
    for Bs in B_SIZES[1:]:
        ideal = Bs * (shared + per_lane) / (shared + Bs * per_lane)
        print(f"bandwidth-model ceiling B={Bs}: {ideal:.2f}x "
              f"(shared matrix bytes = {shared/(shared+per_lane):.0%} of "
              "single-RHS traffic)", flush=True)


if __name__ == "__main__":
    main()
