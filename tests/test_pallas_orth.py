"""Fused Pallas CGS kernels vs the reference numpy formulation
(interpret mode on CPU; compiled path exercised on real TPU by bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from gmres_tpu.ops.pallas.orth_kernel import cgs_pass_pallas


def test_cgs_pass_matches_reference():
    rng = np.random.default_rng(3)
    m1, n = 31, 64 * 1024
    V = np.zeros((m1, n), np.float32)
    V[:7] = rng.standard_normal((7, n)).astype(np.float32)  # zero tail
    w = rng.standard_normal(n).astype(np.float32)

    u, w2 = cgs_pass_pallas(jnp.asarray(V), jnp.asarray(w), interpret=True)
    u_ref = (V.astype(np.float64) @ w).astype(np.float64)
    w_ref = w - u_ref @ V.astype(np.float64)

    scale = float(np.max(np.abs(u_ref)))
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-4, atol=1e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(w2), w_ref, rtol=1e-4,
        atol=1e-5 * float(np.max(np.abs(w_ref))),
    )
    # zero tail stays zero in u
    np.testing.assert_allclose(np.asarray(u)[7:], 0, atol=1e-5 * scale)


def test_cgs_pass_full_basis():
    rng = np.random.default_rng(4)
    m1, n = 8, 32 * 1024
    V = rng.standard_normal((m1, n)).astype(np.float32)
    w = rng.standard_normal(n).astype(np.float32)
    u, w2 = cgs_pass_pallas(jnp.asarray(V), jnp.asarray(w), interpret=True)
    u_ref = V.astype(np.float64) @ w
    np.testing.assert_allclose(
        np.asarray(u), u_ref, rtol=1e-4, atol=1e-5 * float(np.max(np.abs(u_ref)))
    )
