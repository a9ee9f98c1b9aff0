"""DIA (diagonal) format tests: conversion profitability, SpMV parity with
CSR/scipy, solver equivalence, preconditioner factor repacking."""

import jax.numpy as jnp
import numpy as np

from gmres_tpu import GmresConfig, PrecisionSpec, solve
from gmres_tpu.io.rng import rand_vect
from gmres_tpu.io.synth import convection_diffusion_2d, poisson_2d, random_sparse
from gmres_tpu.ops.dia import DIAMatrix, dia_spmv, from_csr, shift_read
from gmres_tpu.ops.spmv import spmv
from gmres_tpu.precond.build import build_ilu_jacobi, optimize_precond_format


def test_from_csr_banded():
    A = poisson_2d(12)
    D = from_csr(A)
    assert D is not None
    assert D.offsets == (-12, -1, 0, 1, 12)
    np.testing.assert_allclose(D.to_dense(), A.to_dense(), rtol=1e-14)


def test_from_csr_rejects_unstructured():
    A = random_sparse(300, row_nnz=8, seed=0)
    assert from_csr(A) is None  # ~8 random cols/row -> hundreds of diagonals


def test_shift_read():
    x = jnp.arange(1.0, 9.0)
    np.testing.assert_array_equal(np.asarray(shift_read(x, 0, 8)), np.arange(1.0, 9.0))
    np.testing.assert_array_equal(
        np.asarray(shift_read(x, 2, 8)), [3, 4, 5, 6, 7, 8, 0, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(shift_read(x, -3, 8)), [0, 0, 0, 1, 2, 3, 4, 5]
    )
    # operand longer/shorter than output
    np.testing.assert_array_equal(np.asarray(shift_read(x, 1, 4)), [2, 3, 4, 5])


def test_dia_spmv_matches_csr():
    A = convection_diffusion_2d(15)
    D = from_csr(A)
    x = np.random.default_rng(0).standard_normal(A.n_rows)
    want = np.asarray(spmv(A, jnp.asarray(x)))
    got = np.asarray(dia_spmv(D, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # spmv() dispatches on type
    got2 = np.asarray(spmv(D, jnp.asarray(x)))
    np.testing.assert_allclose(got2, want, rtol=1e-12)


def test_dia_dtype_staging():
    A = poisson_2d(8)
    D = from_csr(A)
    D32 = D.astype(jnp.float32)
    assert D32.dtype == jnp.float32
    assert D32.offsets == D.offsets


def test_solver_results_equal_with_and_without_dia():
    A = convection_diffusion_2d(12)
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    kw = dict(
        precision=PrecisionSpec.from_mode("mixed"),
        orth="cgsr",
        precond="jacobi",
        restart_length=15,
        tol=1e-9,
        max_restarts=500,
    )
    res_dia = solve(A, b, GmresConfig(auto_format=True, **kw))
    res_csr = solve(A, b, GmresConfig(auto_format=False, **kw))
    assert res_dia.converged and res_csr.converged
    assert res_dia.total_iters == res_csr.total_iters
    np.testing.assert_allclose(
        np.asarray(res_dia.x), np.asarray(res_csr.x), rtol=1e-6, atol=1e-9
    )


def test_ilu_factors_repack():
    A = convection_diffusion_2d(10)
    M = build_ilu_jacobi(A, jnp.float64, steps=2)
    M2 = optimize_precond_format(M)
    assert isinstance(M2.lower, DIAMatrix) and isinstance(M2.upper, DIAMatrix)
    from gmres_tpu.precond.apply import apply_preconditioner

    w = jnp.asarray(np.random.default_rng(1).standard_normal(A.n_rows))
    np.testing.assert_allclose(
        np.asarray(apply_preconditioner(M2, w)),
        np.asarray(apply_preconditioner(M, w)),
        rtol=1e-12,
    )


def test_frobenius_norm_consistent():
    A = poisson_2d(9)
    D = from_csr(A)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(D.vals)),
        float(jnp.linalg.norm(A.vals)),
        rtol=1e-14,
    )
