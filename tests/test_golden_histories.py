"""Golden convergence-history fixtures from the reference's published
tables (VERDICT round-1 item 7).

The (matrix, config) -> (restarts, total_iters) pairs below are the stored
outputs of `plots-and-data.ipynb` cell 5 (`timings_restartsmart_*_identity`
dicts, tuple schema (min, med, max, restarts, total_iters, rlen, rtol,
rorth); mode order [baseline, mixed, single-prec, single]).  All reference
runs: tol=1e-6, rlen=100, seed 42, manufactured b = A @ x_rand
(`gmres_perf_test.cpp:39-51`), identity preconditioner.  rtol code: '0' =
fixed restart, '1e-10' = relative-prec-res policy, 'R1e-06' = repeat-iter
policy with rtol 1e-6 (`automated.py:152`).

SuiteSparse matrices are not vendored (no network in CI); the tests skip
unless MTXDIR points at a directory containing `<name>.mtx`.  A synthetic
test reproduces the published "mixed needs ~2x the iterations" regime
(language: 29 baseline vs 58 mixed) without any download.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gmres_tpu import GmresConfig, solve
from gmres_tpu.io.rng import rand_vect
from gmres_tpu.ops.spmv import spmv

# (matrix, orth, mode) -> (restarts, total_iters, rlen, rtol_code)
# Small-iteration rows from timings_restartsmart_{mgs,cgsr}_identity.
GOLDEN = {
    ("cage13", "mgs", "baseline"): (2, 30, 100, "R1e-06"),
    ("cage13", "mgs", "mixed"): (2, 30, 100, "R1e-06"),
    ("cage13", "cgsr", "baseline"): (2, 30, 100, "R1e-06"),
    ("cage13", "cgsr", "mixed"): (2, 30, 100, "R1e-06"),
    ("cage14", "cgsr", "baseline"): (2, 30, 100, "R1e-06"),
    ("cage14", "cgsr", "mixed"): (2, 30, 100, "R1e-06"),
    ("language", "mgs", "baseline"): (1, 29, 100, "R1e-06"),
    ("language", "mgs", "mixed"): (2, 58, 100, "R1e-06"),
    ("torso2", "mgs", "baseline"): (2, 80, 100, "R1e-06"),
    ("torso2", "mgs", "mixed"): (2, 80, 100, "R1e-06"),
    ("atmosmodj", "mgs", "baseline"): (2, 200, 100, "0"),
    ("atmosmodj", "mgs", "mixed"): (3, 300, 100, "R1e-06"),
    ("stomach", "cgsr", "mixed"): (3, 300, 100, "R1e-06"),
    ("FEM_3D_thermal2", "cgsr", "baseline"): (3, 300, 100, "R1e-06"),
    ("FEM_3D_thermal2", "cgsr", "mixed"): (3, 300, 100, "R1e-06"),
}

MTXDIR = os.environ.get("MTXDIR")


def _cfg(orth, mode, rlen, rtol_code):
    kw = dict(mode=mode, orth=orth, prec="identity", rlen=rlen, tol=1e-6,
              max_restarts=1_000_000)
    if rtol_code == "0":
        kw["rtol"] = 0.0
    elif rtol_code.startswith("R"):
        kw["rtol"] = float(rtol_code[1:])
        kw["repeat_iter"] = True
    else:
        kw["rtol"] = float(rtol_code)
    return GmresConfig.from_flags(**kw)


@pytest.mark.parametrize("key", sorted(GOLDEN))
def test_golden_iteration_counts(key):
    matrix, orth, mode = key
    if not MTXDIR:
        pytest.skip("MTXDIR not set (SuiteSparse matrices not available)")
    path = os.path.join(MTXDIR, matrix + ".mtx")
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")

    from gmres_tpu.io.loader import load_matrix

    A = load_matrix(path)
    restarts_ref, iters_ref, rlen, rtol_code = GOLDEN[key]
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    res = solve(A, b, _cfg(orth, mode, rlen, rtol_code))
    assert res.converged, key
    # fp32 rounding may shift the boundary by one restart; iteration counts
    # must stay within 5% of the published table
    assert abs(res.restarts - restarts_ref) <= 1, (key, res.restarts)
    assert abs(res.total_iters - iters_ref) <= max(2, 0.05 * iters_ref), (
        key, res.total_iters,
    )


def test_mixed_needs_more_iterations_regime():
    """The published language-class regime: at a tolerance near the fp32
    inner loop's per-cycle floor, the mixed scheme converges via extra
    iterative-refinement restarts (~2x the fp64 baseline's iterations)
    while still reaching the fp64-accurate solution
    (language: 29 vs 58 total iterations, BASELINE.md)."""
    from gmres_tpu.io.synth import convection_diffusion_2d

    A = convection_diffusion_2d(24, beta=1.0)
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    # tolerance just beyond what one fp32 inner cycle can deliver: the
    # fp64 baseline converges in a single cycle, the mixed scheme needs a
    # second iterative-refinement restart (measured: 1/150 vs 2/300)
    base = solve(A, b, GmresConfig.from_flags(
        mode="baseline", orth="cgsr", prec="identity", rlen=150, tol=3e-9,
        max_restarts=100))
    mixed = solve(A, b, GmresConfig.from_flags(
        mode="mixed", orth="cgsr", prec="identity", rlen=150, tol=3e-9,
        max_restarts=100))
    assert base.converged and mixed.converged
    assert base.restarts == 1
    assert mixed.restarts == 2
    assert mixed.total_iters >= 1.9 * base.total_iters, (
        base.total_iters, mixed.total_iters,
    )
    err = np.linalg.norm(np.asarray(mixed.x) - x_true)
    assert err < 1e-6
