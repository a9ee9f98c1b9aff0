#!/usr/bin/env python3
"""VERDICT item 3 'done' criterion: a 1-device-mesh shard_map solve within
15% of the non-sharded solve's wall time (the sharded cycle must keep the
Pallas DIA SpMV, fused orth, and df64 outer fast paths).
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(fn, reps=3):
    fn()  # warm/compile
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        _ = float(np.asarray(r.x[:4]).sum())  # fetch barrier
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return r, walls[len(walls) // 2]


def main():
    from jax.sharding import Mesh

    from gmres_tpu import GmresConfig, PrecisionSpec, solve
    from gmres_tpu.io.rng import rand_vect
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.ops.spmv import spmv
    from gmres_tpu.parallel.dist_gmres import AXIS, solve_distributed

    nx = 1024
    A = convection_diffusion_2d(nx, beta=2.0)
    n = A.n_rows
    x_true = rand_vect(n, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"), orth="cgsr",
        precond="identity", restart_length=30, tol=1e-8, max_restarts=80,
    )

    res1, t1 = timed(lambda: solve(A, b, cfg))
    print(f"single-device solve:   {t1:.3f}s restarts={res1.restarts} "
          f"iters={res1.total_iters} conv={res1.converged}", flush=True)

    # pre-staged single-device solve: isolates per-call staging overhead
    # from the cycle itself (round-4 VERDICT weak item 6 — the 1-device
    # mesh measured FASTER than the plain solve; the suspects are per-call
    # conversion work vs genuinely better fusion under shard_map)
    from gmres_tpu import stage

    A_staged = stage(A, cfg)
    jax.block_until_ready(jax.tree.leaves(A_staged))
    res1s, t1s = timed(lambda: solve(A_staged, b, cfg))
    print(f"single-device (staged): {t1s:.3f}s restarts={res1s.restarts} "
          f"iters={res1s.total_iters} conv={res1s.converged}", flush=True)

    mesh = Mesh(np.array(jax.devices()[:1]), (AXIS,))
    resd, td = timed(lambda: solve_distributed(A, b, cfg, mesh=mesh))
    print(f"1-device-mesh solve:   {td:.3f}s restarts={resd.restarts} "
          f"iters={resd.total_iters} conv={resd.converged}", flush=True)
    print(f"ratio: {td/t1:.3f}x (target <= 1.15x)", flush=True)

    # distributed MGS: one-reduce ICWY path vs the sequential recurrence
    # (ops/orth.py:mgs_lowsync_step; on a 1-device mesh the psums are
    # free, so this isolates the reformulation's COMPUTE cost — the
    # collective savings shows up only on real multi-chip meshes)
    for low_sync in (True, False):
        cfg_m = cfg.with_(orth="mgs", low_sync_mgs=low_sync)
        resm, tm = timed(lambda: solve_distributed(A, b, cfg_m, mesh=mesh))
        label = "icwy-1reduce" if low_sync else "sequential  "
        print(f"dist MGS {label}: {tm:.3f}s restarts={resm.restarts} "
              f"iters={resm.total_iters} conv={resm.converged}", flush=True)

    # SELL (unstructured) fast-path retention under sharding (round-2
    # VERDICT item 3 'done' criterion: 1-device-mesh wall within 15% of
    # the non-sharded SELL solve)
    from gmres_tpu.io.synth import unstructured_mesh

    Au = unstructured_mesh(nx * nx, run=8)
    xu = rand_vect(Au.n_rows, 42)
    bu = np.asarray(spmv(Au, jnp.asarray(xu)))
    resu1, tu1 = timed(lambda: solve(Au, bu, cfg))
    print(f"single-device SELL solve: {tu1:.3f}s restarts={resu1.restarts} "
          f"iters={resu1.total_iters} conv={resu1.converged}", flush=True)
    resud, tud = timed(lambda: solve_distributed(Au, bu, cfg, mesh=mesh))
    print(f"1-device-mesh SELL solve: {tud:.3f}s restarts={resud.restarts} "
          f"iters={resud.total_iters} conv={resud.converged}", flush=True)
    print(f"SELL ratio: {tud/tu1:.3f}x (target <= 1.15x)", flush=True)
    from gmres_tpu.parallel.dist_gmres import _DIST_STAGE_CACHE
    from gmres_tpu.parallel.sell_dist import PartitionedSELL

    entry = _DIST_STAGE_CACHE.get(id(Au))
    routed = entry is not None and any(
        isinstance(t, PartitionedSELL)
        for tup in entry[1].values() for t in tup[:2])
    print(f"SELL route retained under mesh: {routed} "
          f"(False = CSR-gather fallback, the round-4 18.2x failure)",
          flush=True)


if __name__ == "__main__":
    main()
