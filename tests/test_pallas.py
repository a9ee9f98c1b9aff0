"""Pallas kernel correctness vs the XLA reference implementations.

Runs in interpreter mode on CPU (the compiled path is exercised on real
TPU hardware by ``cli/bench_kernels.py`` and the headline benchmark).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmres_tpu.io.synth import convection_diffusion_2d, poisson_2d
from gmres_tpu.ops.dia import dia_spmv, from_csr
from gmres_tpu.ops.pallas.spmv_kernel import dia_spmv_pallas


@pytest.mark.parametrize("nx", [16, 33])
@pytest.mark.parametrize("dtype", [jnp.float32])
def test_dia_spmv_pallas_matches_xla(nx, dtype):
    A = from_csr(convection_diffusion_2d(nx, beta=3.0))
    assert A is not None
    A = A.astype(dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(A.n_rows), dtype=dtype)

    ref = dia_spmv(A, x)
    got = dia_spmv_pallas(A, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4,
        atol=1e-5 * float(np.max(np.abs(np.asarray(ref)))),
    )


def test_dia_spmv_pallas_wide_offsets():
    # offsets wider than one lane group (nx > 128)
    A = from_csr(poisson_2d(150))
    assert A is not None
    A = A.astype(jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(A.n_rows), dtype=jnp.float32)
    ref = dia_spmv(A, x)
    got = dia_spmv_pallas(A, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4,
        atol=1e-5 * float(np.max(np.abs(np.asarray(ref)))),
    )
