#!/usr/bin/env python3
"""Multi-RHS serving throughput: solve_batched vs sequential solve().

The batched cycle reads the operator once per Arnoldi step for ALL lanes
(bandwidth amortization), at the cost of running the XLA compute paths
(the fused Pallas kernels do not batch).  Reports:
  - sequential solve() (Pallas fast paths), s solves back to back
  - sequential solve(use_pallas=False), the batched path's single-RHS cost
  - solve_batched over s lanes, one lockstep dispatch chain
"""
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from gmres_tpu import GmresConfig, PrecisionSpec, solve, solve_batched
    from gmres_tpu.io.rng import rand_vect
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.ops.spmv import spmv

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    A = convection_diffusion_2d(nx, beta=2.0)
    n = A.n_rows
    xs = [rand_vect(n, 40 + j) for j in range(s)]
    B = np.stack([np.asarray(spmv(A, jnp.asarray(x))) for x in xs])
    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"), orth="cgsr",
        precond="jacobi", restart_length=30, tol=1e-8, max_restarts=80,
    )

    def timed(fn):
        fn()  # warm/compile
        t0 = time.perf_counter()
        out = fn()
        return out, time.perf_counter() - t0

    rs, t_seq = timed(lambda: [solve(A, B[j], cfg) for j in range(s)])
    iters = sum(r.total_iters for r in rs)
    print(f"sequential (pallas):      {t_seq:.3f}s for {s} solves "
          f"({iters} iters, conv={all(r.converged for r in rs)})",
          flush=True)

    cfg_x = cfg.with_(use_pallas=False)
    rx, t_seqx = timed(lambda: [solve(A, B[j], cfg_x) for j in range(s)])
    print(f"sequential (XLA paths):   {t_seqx:.3f}s for {s} solves "
          f"(conv={all(r.converged for r in rx)})", flush=True)

    rb, t_bat = timed(lambda: solve_batched(A, B, cfg))
    print(f"batched   (XLA, s={s:3d}):  {t_bat:.3f}s "
          f"(conv={all(r.converged for r in rb)})", flush=True)
    print(f"throughput vs sequential-pallas: {t_seq/t_bat:.2f}x; "
          f"vs sequential-XLA: {t_seqx/t_bat:.2f}x; "
          f"per-solve {t_bat/s*1e3:.0f} ms", flush=True)
    # Validate each lane by the solver's own BACKWARD-error criterion
    # ||b - A x|| / (||b|| + ||A||_F ||x||) — forward error scales with
    # the operator's conditioning (~nx^2 here) and legitimately reaches
    # O(0.7) relative at nx=1024 even for a correctly converged solve
    # (the round-4 campaign's first batched run failed on exactly that
    # mis-assertion).  Cross-check lanes against the sequential solver's
    # solutions, which share the criterion.
    a_norm = float(np.linalg.norm(np.asarray(A.vals)[: A.nnz]))
    for j, r in enumerate(rb):
        x_j = np.asarray(r.x, dtype=np.float64)
        res = B[j] - np.asarray(spmv(A, jnp.asarray(x_j)))
        crit = float(np.linalg.norm(res)) / (
            float(np.linalg.norm(B[j])) + a_norm * float(np.linalg.norm(x_j))
        )
        assert r.converged and crit < cfg.tol * 50, (j, r.converged, crit)
        # lane-vs-sequential agreement (same criterion, same config)
        x_seq = np.asarray(rs[j].x, dtype=np.float64)
        rel = np.linalg.norm(x_j - x_seq) / max(np.linalg.norm(x_seq), 1e-30)
        assert rel < 5e-2, (j, rel)


if __name__ == "__main__":
    main()
