"""Config-space fuzz: random small operators x random configuration
combinations (precision tiers x orthogonalizations x preconditioners x
policies x basis compression).  Every solve must either converge with a
solution consistent with its backward-error criterion or terminate
honestly (aborted/diverged flags) — never crash, hang, or return a
silently wrong "converged" result.  Seeds are fixed: the sweep is a
deterministic regression net over feature interactions."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from gmres_tpu import GmresConfig, PrecisionSpec, solve
from gmres_tpu.io.rng import rand_vect
from gmres_tpu.io.synth import (
    convection_diffusion_2d,
    poisson_2d,
    unstructured_mesh,
)
from gmres_tpu.ops.spmv import spmv

MODES = ("baseline", "single-prec", "mixed", "single", "df64")
ORTHS = ("cgs", "mgs", "cgsr")
PRECONDS = ("identity", "jacobi", "ilu_jacobi", "ilu")
POLICIES = (("fixed", 0.0), ("relres", 0.5), ("repeat", 0.5),
            ("orthloss", 1e-4))


def _operator(rng):
    kind = rng.integers(3)
    if kind == 0:
        return poisson_2d(int(rng.integers(8, 14)))
    if kind == 1:
        return convection_diffusion_2d(int(rng.integers(8, 14)),
                                       beta=float(rng.uniform(0.5, 2.5)))
    return unstructured_mesh(int(rng.integers(80, 200)), run=3,
                             seed=int(rng.integers(100)))


@pytest.mark.parametrize("case", range(8))
def test_fuzz_distributed_combinations(case):
    """Distributed variant of the net: tiers x orths x preconds (incl.
    block-Jacobi ILU) x lowsync-MGS over 2/4/8-device meshes."""
    import jax
    from jax.sharding import Mesh

    from gmres_tpu import solve_distributed
    from gmres_tpu.parallel.dist_gmres import AXIS

    rng = np.random.default_rng(70_000 + case)
    A = _operator(rng)
    x_true = rand_vect(A.n_rows, int(rng.integers(1000)))
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    prec = PrecisionSpec.from_mode(("baseline", "mixed", "single",
                                    "df64")[case % 4])
    if case % 3 == 0 and not prec.df64_inner:
        prec = dataclasses.replace(
            prec, basis="bfloat16" if prec.inner != "float64" else "float32")
    cfg = GmresConfig(
        precision=prec,
        orth=ORTHS[case % 3],
        precond=("identity", "jacobi", "ilu_jacobi", "bilu_jacobi")[case % 4],
        jacobi_steps=int(rng.integers(1, 4)),
        restart_length=int(rng.integers(5, 25)),
        tol=1e-7,
        max_restarts=200,
        low_sync_mgs=bool(rng.integers(2)),
    )
    n_dev = int(rng.choice([2, 4, 8]))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))
    r = solve_distributed(A, b, cfg, mesh=mesh)
    assert r.converged or r.aborted or r.diverged, cfg
    if r.converged:
        x = np.asarray(r.x, np.float64)
        res = np.linalg.norm(b - A.to_scipy() @ x)
        bound = cfg.tol * (np.linalg.norm(b)
                           + np.linalg.norm(np.asarray(A.vals))
                           * np.linalg.norm(x))
        assert res <= 50 * bound, (res, bound, cfg)


@pytest.mark.parametrize("case", range(24))
def test_fuzz_config_combinations(case):
    rng = np.random.default_rng(1000 + case)
    A = _operator(rng)
    x_true = rand_vect(A.n_rows, int(rng.integers(1000)))
    b = np.asarray(spmv(A, jnp.asarray(x_true)))

    mode = MODES[case % len(MODES)]
    prec = PrecisionSpec.from_mode(mode)
    # basis compression composes with every non-df64 tier
    if case % 3 == 0 and not prec.df64_inner:
        narrower = "bfloat16" if prec.inner != "float64" else "float32"
        prec = dataclasses.replace(prec, basis=narrower)
    policy, rimp = POLICIES[case % len(POLICIES)]
    cfg = GmresConfig(
        precision=prec,
        orth=ORTHS[case % len(ORTHS)],
        precond=PRECONDS[case % len(PRECONDS)],
        jacobi_steps=int(rng.integers(1, 4)),
        policy=policy,
        restart_improvement=rimp,
        restart_length=int(rng.integers(5, 31)),
        tol=float(rng.choice([1e-6, 1e-8])),
        max_restarts=300,
    )

    r = solve(A, b, cfg)
    assert r.converged or r.aborted or r.diverged or r.stalled, cfg
    if r.converged:
        # the criterion is ||r|| <= tol * (||b|| + ||A||_F ||x||): check
        # the TRUE residual against it in fp64 (loose factor for the
        # low-precision tiers' reported-vs-true residual gap)
        x = np.asarray(r.x, np.float64)
        res = np.linalg.norm(b - A.to_scipy() @ x)
        bound = cfg.tol * (np.linalg.norm(b)
                           + np.linalg.norm(np.asarray(A.vals))
                           * np.linalg.norm(x))
        assert res <= 50 * bound, (res, bound, cfg)
