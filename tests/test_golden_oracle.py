"""Golden iteration-count validation against an independent numpy oracle.

``oracle_gmres.py`` is a dense-arithmetic transcription of the reference
algorithm written straight from ``gmres.cpp`` / ``Orthogonalization.hpp``
/ ``IterUtil.hpp`` — it shares no code with ``gmres_tpu``.  These tests
run the SAME (matrix, config) through both and assert matching
(restarts, total_iters), pinning the algorithm semantics offline where
the SuiteSparse-table fixtures (``test_golden_histories.py``) cannot run
(no network).  Tolerances mirror the golden-table tests: fp rounding may
shift a restart boundary by one.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gmres_tpu import GmresConfig, solve
from gmres_tpu.io.rng import rand_vect
from gmres_tpu.io.synth import convection_diffusion_2d
from gmres_tpu.ops.spmv import spmv

from oracle_gmres import oracle_solve


def _dense(A):
    rp = np.asarray(A.row_ptr).astype(np.int64)
    nnz = int(rp[-1])
    ci = np.asarray(A.col_idx)[:nnz]
    v = np.asarray(A.vals)[:nnz]
    rows = np.repeat(np.arange(A.n_rows), np.diff(rp))
    D = np.zeros((A.n_rows, A.n_cols))
    np.add.at(D, (rows, ci), v)
    return D


def _unstructured(n=768, row_nnz=7, seed=11):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), row_nnz)
    cols = rng.integers(0, n, size=n * row_nnz)
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    key = rows.astype(np.int64) * n + cols
    _, keep = np.unique(key, return_index=True)
    rows, cols = rows[keep], cols[keep]
    vals = rng.standard_normal(rows.shape[0])
    vals[rows == cols] = row_nnz + 2.0
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    rp = np.concatenate([[0], np.cumsum(np.bincount(rows, minlength=n))])
    from gmres_tpu.sparse import csr_from_arrays

    return csr_from_arrays(rp, cols, vals, n_cols=n)


# (matrix, mode, orth, policy, rtol, rlen, tol, prec)
CASES = [
    ("convdiff24", "baseline", "cgsr", "fixed", 0.0, 40, 1e-8, "identity"),
    ("convdiff24", "mixed", "cgsr", "fixed", 0.0, 40, 1e-8, "identity"),
    ("convdiff24", "mixed", "mgs", "relres", 1e-2, 40, 1e-8, "identity"),
    ("convdiff24", "mixed", "cgsr", "repeat", 1e-4, 60, 1e-8, "identity"),
    ("convdiff24", "baseline", "mgs", "fixed", 0.0, 40, 1e-10, "jacobi"),
    ("convdiff24", "mixed", "cgsr", "orthloss", 1e-2, 40, 1e-8, "identity"),
    ("unstruct", "mixed", "cgsr", "fixed", 0.0, 30, 1e-10, "identity"),
    ("unstruct", "baseline", "mgs", "relres", 1e-2, 30, 1e-10, "jacobi"),
    # the headline preconditioner family (ILU(0)-Jacobi, 3 sweeps)
    ("convdiff24", "mixed", "cgsr", "fixed", 0.0, 20, 1e-10, "ilu_jacobi"),
    ("convdiff24", "baseline", "mgs", "fixed", 0.0, 20, 1e-10, "ilu_jacobi"),
]


def _matrix(name):
    if name == "convdiff24":
        return convection_diffusion_2d(24, beta=1.0)
    return _unstructured()


@pytest.mark.parametrize(
    "case", CASES, ids=["-".join(str(c) for c in c[:4]) for c in CASES]
)
def test_framework_matches_oracle(case):
    name, mode, orth, policy, rtol, rlen, tol, prec = case
    A = _matrix(name)
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    A_dense = _dense(A)

    inv_diag = None
    if prec == "jacobi":
        inv_diag = 1.0 / np.diag(A_dense)
    ilu_steps = 3 if prec == "ilu_jacobi" else 0

    ref = oracle_solve(
        A_dense, b, tol=tol, rlen=rlen, max_restarts=400, orth=orth,
        mode=mode, policy=policy, rtol=rtol, inv_diag=inv_diag,
        ilu_jacobi_steps=ilu_steps,
    )
    assert ref.converged, ("oracle did not converge", case)

    cfg = GmresConfig.from_flags(
        mode=mode, orth=orth, prec=prec, rlen=rlen, tol=tol,
        rtol=rtol, repeat_iter=(policy == "repeat"),
        orthloss=(policy == "orthloss"), max_restarts=400,
        jacobi_steps=max(1, ilu_steps),
    )
    res = solve(A, b, cfg)
    assert res.converged, ("framework did not converge", case)

    assert abs(res.restarts - ref.restarts) <= 1, (
        case, res.restarts, ref.restarts)
    assert abs(res.total_iters - ref.total_iters) <= max(
        2, 0.05 * ref.total_iters
    ), (case, res.total_iters, ref.total_iters)


def test_oracle_solution_is_accurate():
    """The oracle itself must solve the system (guards against the oracle
    and framework agreeing on a wrong count because both are broken in the
    same way — the oracle is validated against plain linear algebra)."""
    A = _matrix("convdiff24")
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    D = _dense(A)
    ref = oracle_solve(D, b, tol=1e-10, rlen=40, max_restarts=400,
                       orth="cgsr", mode="mixed", policy="fixed")
    assert ref.converged
    r = b - D @ ref.x
    crit = np.linalg.norm(r) / (
        np.linalg.norm(b)
        + np.linalg.norm(D.astype(np.float32)) * np.linalg.norm(ref.x)
    )
    assert crit <= 1e-10
    assert np.linalg.norm(ref.x - x_true) < 1e-5


# Round-4 (VERDICT item 10): the remaining precision tiers pinned to the
# oracle.  (name, fw_mode, oracle_mode, basis, orth, policy, rtol, rlen,
# tol, prec) — fw_mode is what the framework runs, oracle_mode what the
# oracle models (df64 is fp64-QUALITY, so its counts must match the
# fp64 baseline's; mixed-cb is mixed with a bf16-stored basis).
TIER_CASES = [
    ("convdiff24", "single-prec", "single-prec", None,
     "cgsr", "fixed", 0.0, 40, 1e-8, "jacobi"),
    ("convdiff24", "single-prec", "single-prec", None,
     "mgs", "relres", 1e-2, 40, 1e-8, "ilu_jacobi"),
    ("convdiff24", "single", "single", None,
     "cgsr", "fixed", 0.0, 40, 1e-5, "identity"),
    ("unstruct", "single", "single", None,
     "cgsr", "relres", 1e-2, 30, 1e-5, "jacobi"),
    ("convdiff24", "df64", "baseline", None,
     "cgsr", "fixed", 0.0, 40, 1e-8, "identity"),
    ("unstruct", "df64", "baseline", None,
     "cgs", "relres", 1e-2, 30, 1e-10, "identity"),
    ("convdiff24", "mixed-cb", "mixed", "bfloat16",
     "cgsr", "fixed", 0.0, 40, 1e-8, "identity"),
    ("unstruct", "mixed-cb", "mixed", "bfloat16",
     "cgsr", "relres", 1e-2, 30, 1e-10, "identity"),
]


@pytest.mark.parametrize(
    "case", TIER_CASES,
    ids=["-".join(str(c) for c in (c[0], c[1], c[4], c[5])) for c in TIER_CASES],
)
def test_precision_tiers_match_oracle(case):
    (name, fw_mode, oracle_mode, basis, orth, policy, rtol, rlen, tol,
     prec) = case
    import dataclasses

    import ml_dtypes

    from gmres_tpu.config import PrecisionSpec

    A = _matrix(name)
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    A_dense = _dense(A)

    inv_diag = None
    if prec == "jacobi":
        inv_diag = 1.0 / np.diag(A_dense)
    ilu_steps = 3 if prec == "ilu_jacobi" else 0

    ref = oracle_solve(
        A_dense, b, tol=tol, rlen=rlen, max_restarts=400, orth=orth,
        mode=oracle_mode, policy=policy, rtol=rtol, inv_diag=inv_diag,
        ilu_jacobi_steps=ilu_steps,
        basis_dtype=ml_dtypes.bfloat16 if basis == "bfloat16" else None,
    )
    assert ref.converged, ("oracle did not converge", case)

    spec = PrecisionSpec.from_mode("mixed" if fw_mode == "mixed-cb"
                                   else fw_mode)
    if basis:
        spec = dataclasses.replace(spec, basis=basis)
    cfg = GmresConfig.from_flags(
        mode="mixed", orth=orth, prec=prec, rlen=rlen, tol=tol,
        rtol=rtol, max_restarts=400, jacobi_steps=max(1, ilu_steps),
    )
    cfg = dataclasses.replace(cfg, precision=spec)
    res = solve(A, b, cfg)
    assert res.converged, ("framework did not converge", case)

    # bf16 basis rounding differs slightly between the dense oracle and
    # the framework's kernels; allow one extra restart-boundary shift
    slack = 2 if basis else 1
    assert abs(res.restarts - ref.restarts) <= slack, (
        case, res.restarts, ref.restarts)
    assert abs(res.total_iters - ref.total_iters) <= max(
        slack * rlen // 10 + 2, 0.08 * ref.total_iters
    ), (case, res.total_iters, ref.total_iters)


def test_happy_breakdown_is_guarded():
    """b in a low-dimensional Krylov space: the solver must converge at
    the breakdown step without NaNs (the reference has NO guard here —
    Orthogonalization.hpp:51-60 divides by h(k+1,k); SURVEY.md §2.2 makes
    the guard an explicit design decision of this build)."""
    n = 64
    D = np.diag(np.full(n, 3.0))
    from gmres_tpu.sparse import csr_from_dense

    A = csr_from_dense(D)
    b = np.zeros(n)
    b[5] = 1.0  # K(A, b) is 1-dimensional for a scaled identity
    cfg = GmresConfig.from_flags(mode="mixed", orth="cgsr",
                                 prec="identity", rlen=10, tol=1e-12,
                                 max_restarts=10)
    res = solve(A, b, cfg)
    assert res.converged
    assert np.isfinite(np.asarray(res.x)).all()
    np.testing.assert_allclose(np.asarray(res.x), b / 3.0, rtol=1e-7,
                               atol=1e-12)
