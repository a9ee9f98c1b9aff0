"""Halo-exchange distributed SpMV tests: partitioning invariants, SpMV
parity against the global operator, and full-solver parity against both
the allgather path and the single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gmres_tpu import GmresConfig, PrecisionSpec, solve
from gmres_tpu.io.rng import rand_vect
from gmres_tpu.io.synth import convection_diffusion_2d, poisson_2d, random_sparse
from gmres_tpu.ops.spmv import spmv
from gmres_tpu.parallel.dist_gmres import AXIS, solve_distributed
from gmres_tpu.parallel.halo import HaloCSR, HaloDIA, halo_spmv, partition_halo
from gmres_tpu.parallel.partition import pad_vector


def mesh_of(n):
    return Mesh(np.array(jax.devices()[:n]), (AXIS,))


def run_halo_spmv(H, x, n_shards):
    mesh = mesh_of(n_shards)
    xp = jnp.asarray(pad_vector(np.asarray(x), n_shards))

    def f(Hb, xl):
        return halo_spmv(Hb, xl, AXIS)

    sharded = P(AXIS)
    fn = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=(sharded, sharded),
                      out_specs=sharded, check_vma=False)
    )
    Hs = jax.tree.map(lambda a: jax.device_put(a, NamedSharding(mesh, P(AXIS))), H)
    return np.asarray(fn(Hs, xp))


def test_partition_halo_banded_gives_dia():
    A = poisson_2d(16)  # offsets ±16, ±1, 0
    H = partition_halo(A, 4)
    assert isinstance(H, HaloDIA)
    assert H.offsets == (-16, -1, 0, 1, 16)
    assert H.halo_left >= 16 and H.halo_right >= 16
    assert H.halo_left <= H.rows_per_shard


def test_halo_dia_spmv_matches_global():
    A = poisson_2d(16)
    n = A.n_rows
    x = np.random.default_rng(0).standard_normal(n)
    want = np.asarray(spmv(A, jnp.asarray(x)))
    for P_ in (2, 4, 8):
        H = partition_halo(A, P_)
        got = run_halo_spmv(H, x, P_)
        np.testing.assert_allclose(got[:n], want, rtol=1e-12)
        np.testing.assert_allclose(got[n:], 0, atol=0)


def test_halo_csr_spmv_matches_global():
    # force the CSR halo path: banded-ish but too many distinct diagonals
    rng = np.random.default_rng(3)
    n = 96
    from gmres_tpu.sparse import csr_from_coo

    rows, cols, vals = [], [], []
    for i in range(n):
        js = np.unique(np.clip(i + rng.integers(-7, 8, size=5), 0, n - 1))
        rows.extend([i] * len(js))
        cols.extend(js.tolist())
        vals.extend(rng.standard_normal(len(js)).tolist())
    A = csr_from_coo(np.array(rows), np.array(cols), np.array(vals), n_rows=n)
    from gmres_tpu.ops.dia import from_csr

    H = partition_halo(A, 4)
    assert H is not None
    x = rng.standard_normal(n)
    want = np.asarray(spmv(A, jnp.asarray(x)))
    got = run_halo_spmv(H, x, 4)
    np.testing.assert_allclose(got[:n], want, rtol=1e-11)


def test_partition_halo_rejects_global_coupling():
    A = random_sparse(128, row_nnz=6, seed=1)  # random cols: halo > r
    assert partition_halo(A, 8) is None


def test_distributed_halo_solver_parity():
    A = poisson_2d(12)
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    kw = dict(
        precision=PrecisionSpec.from_mode("mixed"),
        orth="cgsr",
        precond="ilu_jacobi",
        jacobi_steps=2,
        restart_length=15,
        tol=1e-9,
        max_restarts=500,
    )
    res_halo = solve_distributed(A, b, GmresConfig(auto_format=True, **kw),
                                 mesh=mesh_of(4))
    res_ag = solve_distributed(A, b, GmresConfig(auto_format=False, **kw),
                               mesh=mesh_of(4))
    res_single = solve(A, b, GmresConfig(auto_format=False, **kw))
    assert res_halo.converged and res_ag.converged and res_single.converged
    assert res_halo.total_iters == res_ag.total_iters
    np.testing.assert_allclose(
        np.asarray(res_halo.x), np.asarray(res_single.x), rtol=1e-6, atol=1e-9
    )


def test_halo_dtype_staging():
    A = poisson_2d(8)
    H = partition_halo(A, 2)
    H32 = H.astype(jnp.float32)
    assert H32.dtype == jnp.float32
    assert H32.offsets == H.offsets
