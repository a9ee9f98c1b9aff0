#!/usr/bin/env python3
"""Measure per-solve host-side setup overhead on a staged operator (TPU).

VERDICT item 2: a second solve() on a staged operator should cost <50 ms of
host-side setup.  Prints setup/prec/solve walls per repeat.
"""
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    prec = sys.argv[2] if len(sys.argv) > 2 else "identity"
    from gmres_tpu import GmresConfig, PrecisionSpec, solve, stage
    from gmres_tpu.io.rng import rand_vect
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.ops.spmv import spmv

    print(f"devices: {jax.devices()}", flush=True)
    A = convection_diffusion_2d(nx, beta=2.0)
    n, nnz = A.n_rows, A.nnz
    x_true = rand_vect(n, 42)
    b = jax.device_put(jnp.asarray(np.asarray(spmv(A, jnp.asarray(x_true))),
                                   dtype=jnp.float64))
    t0 = time.perf_counter()
    A_staged = stage(A)
    jax.block_until_ready(A_staged.vals)
    print(f"staged in {time.perf_counter()-t0:.2f}s; n={n:,} nnz={nnz:,}",
          flush=True)

    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"), orth="cgsr",
        precond=prec, restart_length=30, tol=1e-8, max_restarts=80,
    )
    M = None
    if prec in ("ilu", "ilu_jacobi"):
        from gmres_tpu.precond.build import build_preconditioner
        M = build_preconditioner(A, cfg)

    for i in range(5):
        t0 = time.perf_counter()
        res = solve(A_staged, b, cfg, M=M)
        wall = time.perf_counter() - t0
        # force completion via a value fetch (block_until_ready lies here)
        _ = float(np.asarray(res.x[:8]).sum())
        wall_fetched = time.perf_counter() - t0
        print(f"[{i}] wall={wall:.3f}s fetched={wall_fetched:.3f}s "
              f"setup={res.setup_seconds*1e3:.1f}ms prec={res.prec_seconds*1e3:.1f}ms "
              f"solve={res.solve_seconds:.3f}s restarts={res.restarts} "
              f"iters={res.total_iters} conv={res.converged}", flush=True)


if __name__ == "__main__":
    main()
