"""Problem padding to the Pallas block alignment (solver/gmres.py):
zero rows/entries must be exactly inert for SpMV, preconditioner
application, and the solve itself."""

import jax
import jax.numpy as jnp
import numpy as np

from gmres_tpu import GmresConfig
from gmres_tpu.io.synth import convection_diffusion_2d
from gmres_tpu.ops.dia import dia_spmv, from_csr
from gmres_tpu.ops.spmv import spmv
from gmres_tpu.precond.apply import typesafe_apply
from gmres_tpu.precond.build import build_preconditioner
from gmres_tpu.solver.gmres import _pad_operator, _pad_prec


def _setup():
    A = convection_diffusion_2d(19)  # n=361, deliberately unaligned
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.n_rows)
    xp = np.concatenate([x, np.zeros(512 - A.n_rows)])
    return A, x, xp


def test_dia_padding_inert():
    A, x, xp = _setup()
    D = from_csr(A)
    Dp = _pad_operator(D, 512)
    y = np.asarray(dia_spmv(D, jnp.asarray(x)))
    yp = np.asarray(dia_spmv(Dp, jnp.asarray(xp)))
    np.testing.assert_allclose(yp[: A.n_rows], y, rtol=1e-12)
    np.testing.assert_allclose(yp[A.n_rows:], 0, atol=0)


def test_csr_padding_inert():
    A, x, xp = _setup()
    Cp = _pad_operator(A, 512)
    y = np.asarray(spmv(A, jnp.asarray(x)))
    yp = np.asarray(spmv(Cp, jnp.asarray(xp)))
    np.testing.assert_allclose(yp[: A.n_rows], y, rtol=1e-12)
    np.testing.assert_allclose(yp[A.n_rows:], 0, atol=0)


def test_prec_padding_inert():
    A, x, xp = _setup()
    cfg = GmresConfig(precond="ilu_jacobi", jacobi_steps=3)
    M = build_preconditioner(A, cfg)
    Mp = _pad_prec(M, 512)
    r = np.asarray(typesafe_apply(M, jnp.asarray(x)))
    rp = np.asarray(typesafe_apply(Mp, jnp.asarray(xp)))
    np.testing.assert_allclose(rp[: A.n_rows], r, rtol=1e-10)
    np.testing.assert_allclose(rp[A.n_rows:], 0, atol=1e-300)
