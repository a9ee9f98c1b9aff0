"""Distributed fast paths (VERDICT round-1 item 3): the sharded cycle must
not silently lose the single-chip Pallas wins.

- windowed DIA kernel == the XLA shifted-slice local block
- df64 halo residual (interpret mode off-TPU) == fp64 reference
- solve_distributed with the df64 outer staged matches the plain
  distributed solve's convergence history
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmres_tpu.io.synth import convection_diffusion_2d, poisson_2d
from gmres_tpu.ops.dia import from_csr, shift_read
from gmres_tpu.parallel.halo import HaloDIA, _exchange_halos, partition_halo


def _halo_window(x, s, r, hl, hr):
    """Host-side [left | local | right] window for shard s."""
    n = x.shape[0]
    lo, hi = s * r - hl, (s + 1) * r + hr
    out = np.zeros(hi - lo, dtype=x.dtype)
    src_lo, src_hi = max(0, lo), min(n, hi)
    out[src_lo - lo: src_hi - lo] = x[src_lo:src_hi]
    return out


def test_windowed_dia_kernel_matches_xla_loop():
    from gmres_tpu.ops.pallas.spmv_kernel import dia_spmv_pallas_windowed

    A = poisson_2d(20)  # n=400, offsets 0, +-1, +-20
    H = partition_halo(A, 4)
    assert isinstance(H, HaloDIA)
    r, hl, hr = H.rows_per_shard, H.halo_left, H.halo_right
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4 * r)

    for s in range(4):
        xx = jnp.asarray(_halo_window(x, s, r, hl, hr), jnp.float32)
        data = jnp.asarray(np.asarray(H.data)[s], jnp.float32)
        want = jnp.zeros((r,), jnp.float32)
        for d, off in enumerate(H.offsets):
            want = want + data[d] * shift_read(xx, off + hl, r)
        got = dia_spmv_pallas_windowed(data, xx, hl, hr, H.offsets,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_df64_halo_residual_matches_fp64():
    """r = b - A x via the sharded df64 kernel vs numpy fp64."""
    from gmres_tpu.ops.pallas.df64_kernel import (
        DF64HaloDia,
        residual_df64_halo,
        split_f64,
    )
    from gmres_tpu.parallel.dist_gmres import AXIS, _shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    n_dev = 4
    A = convection_diffusion_2d(16, beta=1.0)  # n=256
    H = partition_halo(A.astype(jnp.float64), n_dev)
    assert isinstance(H, HaloDIA)
    D = DF64HaloDia.from_halo(H)
    r = H.rows_per_shard
    n_pad = n_dev * r

    rng = np.random.default_rng(1)
    x = rng.standard_normal(n_pad)
    x[A.n_rows:] = 0.0
    b = rng.standard_normal(n_pad)
    b[A.n_rows:] = 0.0

    mesh = Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))

    def local(Dl, bh, bl, xh, xl):
        rh, rl, rss, xss = residual_df64_halo(Dl, bh, bl, xh, xl, AXIS)
        rss = jax.lax.psum(rss, AXIS)
        xss = jax.lax.psum(xss, AXIS)
        return rh, rl, rss, xss

    fn = _shard_map(
        local, mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(), P()),
    )
    bh, bl = split_f64(jnp.asarray(b))
    xh, xl = split_f64(jnp.asarray(x))
    rh, rl, rss, xss = fn(D, bh, bl, xh, xl)

    r_ref = b - A.to_scipy() @ x[: A.n_rows] if A.n_rows == n_pad else None
    dense = np.zeros((n_pad, n_pad))
    dense[: A.n_rows, : A.n_rows] = A.to_scipy().toarray()
    r_ref = b - dense @ x
    got = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    np.testing.assert_allclose(got, r_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(rss) ** 0.5, np.linalg.norm(r_ref),
                               rtol=1e-6)
    np.testing.assert_allclose(float(xss) ** 0.5, np.linalg.norm(x), rtol=1e-6)


def test_solve_distributed_df64_matches_plain():
    """The df64-staged distributed mixed solve reproduces the plain
    distributed solve's convergence history (same restarts/iters)."""
    from gmres_tpu import GmresConfig, PrecisionSpec
    from gmres_tpu.io.rng import rand_vect
    from gmres_tpu.ops.spmv import spmv
    from gmres_tpu.parallel.dist_gmres import AXIS, solve_distributed
    from jax.sharding import Mesh

    n_dev = 4
    A = convection_diffusion_2d(16, beta=1.0)
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"),
        orth="cgsr",
        precond="jacobi",
        restart_length=12,
        tol=1e-9,
        max_restarts=60,
    )
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))
    res_plain = solve_distributed(A, b, cfg, mesh=mesh)
    res_df64 = solve_distributed(A, b, cfg, mesh=mesh, force_df64=True)
    assert res_df64.converged
    assert res_df64.restarts == res_plain.restarts
    assert res_df64.total_iters == res_plain.total_iters
    err = np.linalg.norm(np.asarray(res_df64.x) - x_true)
    assert err < 1e-5, err
