"""Level-scheduled exact-ILU triangular solves (`precond/level_ilu.py`,
the csrsv2 analog — reference `kernels_cuda.cpp:617-695`) vs the host
substitution oracle, plus chunking edge cases and routing (round-3
VERDICT missing item 5 / next-round item 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gmres_tpu.io.synth import convection_diffusion_2d, random_sparse
from gmres_tpu.precond.apply import apply_preconditioner
from gmres_tpu.precond.build import build_ilu_exact, build_ilu_jacobi
from gmres_tpu.precond.level_ilu import (
    LevelILUPrec,
    _level_chunks,
    build_level_ilu,
    level_ilu_apply,
    triangular_levels,
)
from gmres_tpu.sparse import csr_from_dense


def _factors(A, dtype=jnp.float64):
    """Split ILU(0) triangles + levels via the production build path."""
    M = build_ilu_jacobi(A, dtype, steps=1)
    rp = np.asarray(A.row_ptr).astype(np.int64)
    ci = np.asarray(A.col_idx)[: rp[-1]].astype(np.int64)
    from gmres_tpu.precond.ilu0 import diag_positions

    diag = diag_positions(rp, ci)
    lev_l, lev_u = triangular_levels(rp, ci, diag)
    return M.lower, M.upper, np.asarray(M.inv_diag), lev_l, lev_u


def _oracle(lower, upper, w):
    """Exact substitution: solve (I+L_strict) y = w, then U y' = y."""
    n = lower.n_rows
    L = np.eye(n) + lower.to_scipy().toarray().astype(np.float64)
    U = upper.to_scipy().toarray().astype(np.float64)
    return np.linalg.solve(U, np.linalg.solve(L, w.astype(np.float64)))


def test_level_ilu_matches_substitution_unstructured():
    """Multi-chunk apply on an unstructured (non-banded) ILU factor equals
    the dense substitution oracle."""
    A = random_sparse(500, row_nnz=6, seed=7)
    lower, upper, inv_diag, lev_l, lev_u = _factors(A)
    # small rows_target -> many chunks, exercising the scan + halo logic
    prec, work = build_level_ilu(lower, upper, inv_diag, lev_l, lev_u,
                                 rows_target=64)
    assert prec.l_rows.shape[0] > 1 and prec.u_rows.shape[0] > 1
    assert work > 0
    w = np.random.default_rng(3).standard_normal(A.n_rows)
    got = np.asarray(level_ilu_apply(prec, jnp.asarray(w)))
    np.testing.assert_allclose(got, _oracle(lower, upper, w), rtol=1e-10)


def test_level_ilu_matches_substitution_banded():
    """Same oracle check on a banded operator (cross-checks the fused
    VMEM kernel's problem class through the level-scheduled path)."""
    A = convection_diffusion_2d(20)  # n=400, levels ~ O(n) per triangle
    lower, upper, inv_diag, lev_l, lev_u = _factors(A)
    prec, _ = build_level_ilu(lower, upper, inv_diag, lev_l, lev_u,
                              rows_target=96)
    w = np.random.default_rng(5).standard_normal(A.n_rows)
    got = np.asarray(level_ilu_apply(prec, jnp.asarray(w)))
    np.testing.assert_allclose(got, _oracle(lower, upper, w), rtol=1e-9)


def test_level_ilu_single_level_diagonal():
    """Diagonal factor: every row is level 0 (one level, split across
    chunks when oversized); apply is exactly inv_diag * w."""
    n = 37  # not a multiple of rows_target -> padding rows exercised
    d = np.linspace(1.0, 5.0, n)
    A = csr_from_dense(np.diag(d))
    lower, upper, inv_diag, lev_l, lev_u = _factors(A)
    assert lev_l.max() == 0 and lev_u.max() == 0
    prec, work = build_level_ilu(lower, upper, inv_diag, lev_l, lev_u,
                                 rows_target=8)
    # one level split into ceil(37/8) = 5 single-sweep chunks
    assert prec.u_rows.shape[0] == 5
    assert int(np.asarray(prec.u_sweeps).max()) == 1
    w = np.random.default_rng(1).standard_normal(n)
    got = np.asarray(level_ilu_apply(prec, jnp.asarray(w)))
    np.testing.assert_allclose(got, w / d, rtol=1e-12)


def test_level_ilu_tridiagonal_chain():
    """Tridiagonal: n distinct levels; chunks group whole levels and the
    per-chunk sweep count equals the level span (exactness guarantee)."""
    n = 30
    T = np.eye(n) * 2 + np.eye(n, k=1) * -1 + np.eye(n, k=-1) * -1
    A = csr_from_dense(T)
    lower, upper, inv_diag, lev_l, lev_u = _factors(A)
    assert lev_l.max() == n - 1 and lev_u.max() == n - 1
    prec, _ = build_level_ilu(lower, upper, inv_diag, lev_l, lev_u,
                              rows_target=7)
    sweeps = np.asarray(prec.l_sweeps)
    rows = np.asarray(prec.l_rows)
    for c in range(rows.shape[0]):
        valid = rows[c][rows[c] != n]
        span = int(lev_l[valid].max() - lev_l[valid].min()) + 1
        assert int(sweeps[c]) == span
    w = np.random.default_rng(2).standard_normal(n)
    got = np.asarray(level_ilu_apply(prec, jnp.asarray(w)))
    np.testing.assert_allclose(got, _oracle(lower, upper, w), rtol=1e-9)


def test_level_ilu_apply_pads_and_slices():
    """apply at a padded (solver) width: owned rows agree, tail stays 0."""
    A = random_sparse(100, row_nnz=5, seed=11)
    lower, upper, inv_diag, lev_l, lev_u = _factors(A)
    prec, _ = build_level_ilu(lower, upper, inv_diag, lev_l, lev_u,
                              rows_target=32)
    w = np.random.default_rng(4).standard_normal(100)
    want = np.asarray(level_ilu_apply(prec, jnp.asarray(w)))
    w_pad = np.zeros(128)
    w_pad[:100] = w
    got = np.asarray(level_ilu_apply(prec, jnp.asarray(w_pad)))
    assert got.shape[0] == 128
    np.testing.assert_allclose(got[:100], want, rtol=1e-12)
    np.testing.assert_allclose(got[100:], 0, atol=0)


def test_level_chunks_cover_all_rows_once():
    rng = np.random.default_rng(9)
    lev = rng.integers(0, 12, size=257)
    chunks = _level_chunks(lev, rows_target=40)
    seen = np.concatenate(chunks)
    assert sorted(seen.tolist()) == list(range(257))
    # ascending level order across chunk boundaries
    for a, b in zip(chunks[:-1], chunks[1:]):
        assert lev[a].max() <= lev[b].min() or (lev[a].max() == lev[b].max())


def test_build_ilu_exact_routes_to_level_fallback():
    """When the full-sweep work gate trips but the level-scheduled work
    fits, build_ilu_exact returns a LevelILUPrec whose apply matches the
    oracle (routing + correctness; round-3 suite-red fix)."""
    from gmres_tpu.precond import build as build_mod

    A = random_sparse(300, row_nnz=5, seed=13)
    lower, upper, _, _, _ = _factors(A, jnp.float64)
    old_budget = build_mod._SWEEP_WORK_BUDGET
    real_counts = build_mod.triangular_level_counts

    def fake_counts(rp, ci, diag):
        return 10**9, 10**9  # force the full-sweep gate to refuse

    build_mod.triangular_level_counts = fake_counts
    try:
        M = build_ilu_exact(A, jnp.float64)
        assert isinstance(M, LevelILUPrec)
        w = np.random.default_rng(6).standard_normal(A.n_rows)
        got = np.asarray(apply_preconditioner(M, jnp.asarray(w)))
        np.testing.assert_allclose(got, _oracle(lower, upper, w), rtol=1e-10)
    finally:
        build_mod.triangular_level_counts = real_counts
        build_mod._SWEEP_WORK_BUDGET = old_budget


def test_build_ilu_exact_refuses_when_level_work_too_big():
    """When even the level-scheduled work exceeds the budget, the build
    refuses with ilu_jacobi guidance (the honest gate)."""
    from gmres_tpu.precond import build as build_mod
    from gmres_tpu.precond import level_ilu as level_mod

    A = random_sparse(200, row_nnz=5, seed=17)
    real_counts = build_mod.triangular_level_counts
    real_build = level_mod.build_level_ilu

    def fake_counts(rp, ci, diag):
        return 10**9, 10**9

    def fat_build(*a, **k):
        prec, _ = real_build(*a, **k)
        return prec, build_mod._SWEEP_WORK_BUDGET + 1

    build_mod.triangular_level_counts = fake_counts
    level_mod.build_level_ilu = fat_build
    try:
        with pytest.raises(ValueError, match="ilu_jacobi"):
            build_ilu_exact(A, jnp.float64)
    finally:
        build_mod.triangular_level_counts = real_counts
        level_mod.build_level_ilu = real_build
