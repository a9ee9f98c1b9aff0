"""Distributed (shard_map) solver tests on the 8-virtual-device CPU mesh:
parity with the single-device solver, partitioner invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gmres_tpu import GmresConfig, PrecisionSpec, solve
from gmres_tpu.io.rng import rand_vect
from gmres_tpu.io.synth import convection_diffusion_2d, poisson_2d
from gmres_tpu.ops.spmv import spmv
from gmres_tpu.parallel.dist_gmres import AXIS, solve_distributed
from gmres_tpu.parallel.partition import partition_rows


def mesh_of(n):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), (AXIS,))


def test_partitioner_roundtrip():
    A = convection_diffusion_2d(9)  # n=81, not divisible by 4
    part = partition_rows(A, 4)
    assert part.rows_per_shard * 4 >= A.n_rows
    # reassemble and compare spmv results
    x = np.random.default_rng(0).standard_normal(part.n_cols)
    want = A.to_scipy() @ x[: A.n_rows]
    got = np.zeros(part.n_cols)
    for s in range(4):
        rp = np.asarray(part.row_ptr[s])
        ci = np.asarray(part.col_idx[s])
        v = np.asarray(part.vals[s])
        for i in range(part.rows_per_shard):
            acc = 0.0
            for k in range(rp[i], rp[i + 1]):
                acc += v[k] * x[ci[k]]
            got[s * part.rows_per_shard + i] = acc
    np.testing.assert_allclose(got[: A.n_rows], want, rtol=1e-12)
    np.testing.assert_allclose(got[A.n_rows :], 0, atol=0)


@pytest.mark.parametrize("n_dev", [2, 8])
@pytest.mark.parametrize("mode", ["baseline", "mixed"])
def test_distributed_matches_single_device(n_dev, mode):
    A = poisson_2d(12)
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode(mode),
        orth="cgs",
        precond="jacobi",
        restart_length=15,
        tol=1e-8,
        max_restarts=500,
    )
    res_s = solve(A, b, cfg)
    res_d = solve_distributed(A, b, cfg, mesh=mesh_of(n_dev))
    assert res_d.converged
    # same restart structure (reductions are mathematically identical; tiny
    # fp reassociation differences can shift a borderline restart, so allow
    # minimal slack on iteration counts)
    assert abs(res_d.total_iters - res_s.total_iters) <= cfg.restart_length
    np.testing.assert_allclose(
        np.asarray(res_d.x), np.asarray(res_s.x), rtol=1e-6, atol=1e-8
    )


@pytest.mark.parametrize("prec", ["identity", "ilu_jacobi"])
def test_distributed_preconditioners(prec):
    A = convection_diffusion_2d(10)
    x_true = rand_vect(A.n_rows, 7)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"),
        orth="cgsr",
        precond=prec,
        jacobi_steps=3,
        restart_length=20,
        tol=1e-8,
        max_restarts=500,
    )
    res = solve_distributed(A, b, cfg, mesh=mesh_of(8))
    assert res.converged
    err = np.linalg.norm(np.asarray(res.x) - x_true)
    assert err < 1e-3


@pytest.mark.parametrize("low_sync", [True, False])
def test_distributed_mgs(low_sync):
    """Distributed MGS: the default one-reduce ICWY path (low_sync_mgs)
    and the textbook k+1-psum recurrence both converge like single-device
    MGS (same restart structure, same solution)."""
    A = poisson_2d(10)
    x_true = rand_vect(A.n_rows, 1)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("baseline"),
        orth="mgs",
        precond="identity",
        restart_length=12,
        tol=1e-8,
        max_restarts=500,
        low_sync_mgs=low_sync,
    )
    res_s = solve(A, b, cfg)
    res = solve_distributed(A, b, cfg, mesh=mesh_of(4))
    assert res.converged
    assert abs(res.total_iters - res_s.total_iters) <= cfg.restart_length
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res_s.x), rtol=1e-6, atol=1e-8
    )


@pytest.mark.parametrize("policy,rimp", [
    ("relres", 0.5),
    ("repeat", 0.5),
    ("orthloss", 1e-4),
])
def test_distributed_policies(policy, rimp):
    """Non-FIXED restart policies under shard_map: the policy predicates
    (including orthloss's S-recurrence gram psum) agree with the
    single-device cycle — same restart structure, same solution."""
    A = convection_diffusion_2d(10)
    x_true = rand_vect(A.n_rows, 5)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"),
        orth="cgsr",
        precond="jacobi",
        policy=policy,
        restart_improvement=rimp,
        restart_length=15,
        tol=1e-8,
        max_restarts=500,
    )
    res_s = solve(A, b, cfg)
    res_d = solve_distributed(A, b, cfg, mesh=mesh_of(8))
    assert res_d.converged and res_s.converged
    # policy triggers are scalar comparisons on psum'd quantities; tiny
    # reassociation differences can shift a borderline restart boundary
    assert abs(res_d.restarts - res_s.restarts) <= 1
    np.testing.assert_allclose(
        np.asarray(res_d.x), np.asarray(res_s.x), rtol=1e-5, atol=1e-7
    )


def test_distributed_mgs_mixed_lowsync():
    """Mixed precision (f32 inner) distributed MGS on the ICWY path."""
    A = convection_diffusion_2d(10)
    x_true = rand_vect(A.n_rows, 3)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"),
        orth="mgs",
        precond="jacobi",
        restart_length=15,
        tol=1e-8,
        max_restarts=500,
    )
    res = solve_distributed(A, b, cfg, mesh=mesh_of(8))
    assert res.converged
    assert np.linalg.norm(np.asarray(res.x) - x_true) < 1e-3
