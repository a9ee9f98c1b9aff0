"""Native C++ extension tests: parity with the numpy reference paths and
with scipy oracles.  Skipped cleanly if the toolchain is unavailable."""

import numpy as np
import pytest

try:
    from gmres_tpu.native import (
        ilu0_native,
        levels_native,
        parse_coord_native,
        trisolve_native,
    )
    from gmres_tpu.native import _get_lib

    _get_lib()
    HAVE_NATIVE = True
except ImportError:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")


def csr_parts(A):
    rp = np.asarray(A.row_ptr)
    nnz = int(rp[-1])
    return rp, np.asarray(A.col_idx)[:nnz], np.asarray(A.vals)[:nnz]


def test_ilu0_native_matches_numpy():
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.precond.ilu0 import ilu0_factorize_numpy

    A = convection_diffusion_2d(12)
    rp, ci, v = csr_parts(A)
    fv_n, d_n = ilu0_native(rp, ci, v)
    fv_p, d_p = ilu0_factorize_numpy(rp, ci, v)
    np.testing.assert_array_equal(d_n, d_p)
    np.testing.assert_allclose(fv_n, fv_p, rtol=1e-15)


def test_ilu0_native_boost_and_f32():
    from gmres_tpu.io.synth import poisson_2d
    from gmres_tpu.precond.ilu0 import ilu0_factorize_numpy

    A = poisson_2d(9)
    rp, ci, v = csr_parts(A)
    fv_n, _ = ilu0_native(rp, ci, v, factor_dtype=np.float32)
    fv_p, _ = ilu0_factorize_numpy(rp, ci, v, factor_dtype=np.float32)
    assert fv_n.dtype == np.float32
    np.testing.assert_array_equal(fv_n, fv_p)


def test_levels_native():
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.precond.ilu0 import diag_positions, triangular_level_counts

    A = convection_diffusion_2d(8)
    rp, ci, v = csr_parts(A)
    d = diag_positions(rp.astype(np.int64), ci.astype(np.int64))
    nl, nu = levels_native(rp, ci, d)
    # numpy reference (force the fallback by calling the loop directly)
    import gmres_tpu.precond.ilu0 as ilu0mod

    n = rp.shape[0] - 1
    lev_l = np.zeros(n, dtype=np.int64)
    for i in range(n):
        lo, hi = rp[i], d[i]
        if hi > lo:
            lev_l[i] = 1 + lev_l[ci[lo:hi]].max()
    lev_u = np.zeros(n, dtype=np.int64)
    for i in range(n - 1, -1, -1):
        lo, hi = d[i] + 1, rp[i + 1]
        if hi > lo:
            lev_u[i] = 1 + lev_u[ci[lo:hi]].max()
    assert nl == int(lev_l.max()) + 1
    assert nu == int(lev_u.max()) + 1


def test_trisolve_native_oracle():
    import scipy.sparse as sp

    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.precond.ilu0 import ilu0_factorize_numpy

    A = convection_diffusion_2d(10)
    rp, ci, v = csr_parts(A)
    fv, d = ilu0_factorize_numpy(rp, ci, v)
    n = A.n_rows
    LU = sp.csr_matrix((fv, ci, rp), shape=(n, n)).toarray()
    L = np.tril(LU, -1) + np.eye(n)
    U = np.triu(LU)
    b = np.random.default_rng(0).standard_normal(n)
    want = np.linalg.solve(U, np.linalg.solve(L, b))
    got = trisolve_native(rp, ci, fv, d, b)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_parse_coord_native():
    text = b"1 2 3.5\n% comment\n2 1 -1e-3\n3 3 7\n"
    I, J, V = parse_coord_native(text, 3)
    np.testing.assert_array_equal(I, [0, 1, 2])
    np.testing.assert_array_equal(J, [1, 0, 2])
    np.testing.assert_allclose(V, [3.5, -1e-3, 7.0])


def test_parse_coord_native_pattern_and_error():
    I, J, V = parse_coord_native(b"1 1\n2 2\n", 2, pattern=True)
    np.testing.assert_array_equal(V, [1.0, 1.0])
    with pytest.raises(ValueError):
        parse_coord_native(b"1 1 2.0\n", 5)


def test_loader_uses_native_path(tmp_path):
    """End-to-end: load_matrix over the native parser equals numpy path."""
    from gmres_tpu.io import mmio
    from gmres_tpu.io.loader import load_matrix
    from gmres_tpu.io.synth import poisson_2d

    A = poisson_2d(7)
    rp, ci, v = csr_parts(A)
    rows = np.repeat(np.arange(A.n_rows), np.diff(rp))
    p = tmp_path / "n.mtx"
    mmio.write_coordinate(p, A.n_rows, A.n_cols, rows, ci, v)
    B = load_matrix(p)
    np.testing.assert_allclose(B.to_dense(), A.to_dense(), rtol=1e-15)


def test_ilu0_native_speed_smoke():
    """Native ILU(0) on a ~90k-row matrix finishes fast (the numpy loop
    would take minutes here)."""
    import time

    from gmres_tpu.io.synth import poisson_2d

    A = poisson_2d(300)  # n=90,000
    rp, ci, v = csr_parts(A)
    t0 = time.perf_counter()
    fv, d = ilu0_native(rp, ci, v)
    assert time.perf_counter() - t0 < 2.0
    assert fv.shape[0] == int(rp[-1])
