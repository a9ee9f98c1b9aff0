#!/usr/bin/env python3
"""Attribute the 1-device-mesh slowdown: time SpMV and orth chains inside
shard_map vs plain, on the real TPU."""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def fetch(x):
    return float(np.asarray(x).reshape(-1)[0])


def chain(fn, x0, iters=50):
    @jax.jit
    def run(x):
        def body(i, x):
            y = fn(x + i * 1e-12)
            return y / jnp.sqrt(jnp.sum(y * y))
        return jax.lax.fori_loop(0, iters, body, x)
    _ = fetch(run(x0))
    t0 = time.perf_counter()
    _ = fetch(run(x0))
    return (time.perf_counter() - t0) / iters


def main():
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.ops.dia import dia_spmv, from_csr
    from gmres_tpu.parallel.dist_gmres import AXIS, _shard_map
    from gmres_tpu.parallel.halo import halo_spmv, partition_halo

    nx = 1024
    A = convection_diffusion_2d(nx, beta=2.0)
    n = A.n_rows
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)

    dia = from_csr(A).astype(jnp.float32)
    dia = jax.device_put(dia)
    t = chain(lambda v: dia_spmv(dia, v), x)
    print(f"plain dia_spmv:        {t*1e3:.3f} ms", flush=True)

    mesh = Mesh(np.array(jax.devices()[:1]), (AXIS,))
    H = partition_halo(A, 1)
    H = jax.device_put(H.astype(jnp.float32))
    sharded = NamedSharding(mesh, P(AXIS))
    xs = jax.device_put(x, sharded)

    def local_spmv(Hl, v):
        return halo_spmv(Hl, v, AXIS)

    fn = _shard_map(local_spmv, mesh, in_specs=(P(AXIS), P(AXIS)),
                    out_specs=P(AXIS))
    t = chain(lambda v: fn(H, v), xs)
    print(f"shard_map halo_spmv:   {t*1e3:.3f} ms", flush=True)

    # fused orth inside shard_map
    from gmres_tpu.ops.orth import orthonormalize_step

    m1 = 31
    V = jax.device_put(jnp.tile((x * 0.1)[None, :], (m1, 1)), sharded)

    def orth_plain(w):
        h, w2, hn = orthonormalize_step("cgsr", V0, 3, w,
                                        assume_zero_tail=True)
        return w2 / (hn + 1)

    V0 = jax.device_put(jnp.tile((x * 0.1)[None, :], (m1, 1)))
    t = chain(orth_plain, x)
    print(f"plain cgsr step:       {t*1e3:.3f} ms", flush=True)

    def orth_local(Vl, w):
        h, w2, hn = orthonormalize_step("cgsr", Vl, 3, w, axis_name=AXIS,
                                        assume_zero_tail=True)
        return w2 / (hn + 1)

    fno = _shard_map(orth_local, mesh, in_specs=(P(None, AXIS), P(AXIS)),
                     out_specs=P(AXIS))
    t = chain(lambda w: fno(V, w), xs)
    print(f"shard_map cgsr step:   {t*1e3:.3f} ms", flush=True)

    # full distributed restart cycle vs the plain one
    from gmres_tpu import GmresConfig, PrecisionSpec
    from gmres_tpu.io.rng import rand_vect
    from gmres_tpu.ops.spmv import spmv as _spmv
    from gmres_tpu.parallel.dist_gmres import make_distributed_cycle
    from gmres_tpu.parallel.dist_gmres import solve_distributed
    from gmres_tpu import solve as _solve

    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"), orth="cgsr",
        precond="identity", restart_length=30, tol=1e-8, max_restarts=3,
        host_sync_every=1,
    )
    x_true = rand_vect(n, 42)
    b = np.asarray(_spmv(A, jnp.asarray(x_true)))
    r = solve_distributed(A, b, cfg, mesh=mesh)  # compile
    t0 = time.perf_counter()
    r = solve_distributed(A, b, cfg, mesh=mesh)
    _ = float(np.asarray(r.x[:2]).sum())
    td = time.perf_counter() - t0
    print(f"dist 3-restart warm:   {td:.3f} s ({td/max(r.total_iters,1)*1e3:.2f} ms/iter)",
          flush=True)
    r2 = _solve(A, b, cfg)
    t0 = time.perf_counter()
    r2 = _solve(A, b, cfg)
    _ = float(np.asarray(r2.x[:2]).sum())
    ts = time.perf_counter() - t0
    print(f"plain 3-restart warm:  {ts:.3f} s ({ts/max(r2.total_iters,1)*1e3:.2f} ms/iter)",
          flush=True)


if __name__ == "__main__":
    main()
