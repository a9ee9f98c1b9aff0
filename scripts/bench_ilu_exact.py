#!/usr/bin/env python3
"""VERDICT item 5 'done' criterion: a prec=ilu solve at n=262144 completes
in seconds and the fused-kernel triangular solve matches the host oracle.
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from gmres_tpu import GmresConfig, PrecisionSpec, solve
    from gmres_tpu.io.rng import rand_vect
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.ops.spmv import spmv
    from gmres_tpu.precond.apply import apply_preconditioner
    from gmres_tpu.precond.build import (
        ExactILUDIAPrec,
        build_ilu_exact,
        build_ilu_jacobi,
    )

    nx = 512
    A = convection_diffusion_2d(nx, beta=2.0)
    n = A.n_rows
    print(f"n={n:,} nnz={A.nnz:,}", flush=True)

    t0 = time.perf_counter()
    M = build_ilu_exact(A, jnp.float32)
    print(f"exact ILU built in {time.perf_counter()-t0:.1f}s: "
          f"{type(M).__name__} steps=({M.steps_l},{M.steps_u})"
          if isinstance(M, ExactILUDIAPrec) else f"fallback {type(M).__name__}",
          flush=True)
    assert isinstance(M, ExactILUDIAPrec)

    # host oracle: exact substitution on the same factors
    Mref = build_ilu_jacobi(A, jnp.float32, steps=1)
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    L = sp.identity(n, format="csr") + Mref.lower.to_scipy().astype(np.float64)
    U = Mref.upper.to_scipy().astype(np.float64).tocsr()
    rng = np.random.default_rng(0)
    w = rng.standard_normal(n).astype(np.float32)
    want = spla.spsolve_triangular(
        U, spla.spsolve_triangular(L, w.astype(np.float64), lower=True),
        lower=False,
    )

    t0 = time.perf_counter()
    got = np.asarray(apply_preconditioner(M, jnp.asarray(w)))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = np.asarray(apply_preconditioner(M, jnp.asarray(w + 1e-9)))
    t_apply = time.perf_counter() - t0
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    print(f"fused trisolve apply: {t_apply*1e3:.1f} ms (first {t_first:.1f}s) "
          f"rel err vs host oracle: {rel:.2e}", flush=True)
    assert rel < 2e-4, rel

    x_true = rand_vect(n, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    cfg = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"), orth="cgsr",
        precond="ilu", restart_length=30, tol=1e-8, max_restarts=60,
    )
    t0 = time.perf_counter()
    res = solve(A, b, cfg)
    _ = float(np.asarray(res.x[:4]).sum())
    wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = solve(A, b, cfg)
    _ = float(np.asarray(res.x[:4]).sum())
    wall2 = time.perf_counter() - t0
    # forward error is amplified by cond(A) over the tol=1e-8 backward
    # error — report it RELATIVE so the artifact is self-explanatory
    err = (np.linalg.norm(np.asarray(res.x) - x_true)
           / np.linalg.norm(x_true))
    print(f"prec=ilu mixed solve: wall={wall:.2f}s warm={wall2:.2f}s "
          f"restarts={res.restarts} iters={res.total_iters} "
          f"conv={res.converged} rel fwd err={err:.2e}", flush=True)

    # exact trisolve vs ILU-Jacobi(3): the reference's key negative result
    # is that exact-trisolve ILU is a net SLOWDOWN for the mixed scheme
    # (0.91x MGS) while ILU-Jacobi wins (1.03-1.13x) —
    # plots-and-data.ipynb:723,899.  Mirror the comparison on TPU.
    cfg_j = cfg.with_(precond="ilu_jacobi", jacobi_steps=3)
    res_j = solve(A, b, cfg_j)  # warm
    t0 = time.perf_counter()
    res_j = solve(A, b, cfg_j)
    _ = float(np.asarray(res_j.x[:4]).sum())
    wall_j = time.perf_counter() - t0
    err_j = (np.linalg.norm(np.asarray(res_j.x) - x_true)
             / np.linalg.norm(x_true))
    print(f"prec=ilu_jacobi(3) mixed solve: warm={wall_j:.2f}s "
          f"restarts={res_j.restarts} iters={res_j.total_iters} "
          f"conv={res_j.converged} rel fwd err={err_j:.2e}", flush=True)
    print(f"exact-vs-jacobi wall ratio: {wall2/wall_j:.3f}x "
          f"(reference: exact costs ~1.13-1.24x more per ipynb:723,899)",
          flush=True)

    # unstructured factor: the level-scheduled path (precond/level_ilu.py,
    # the csrsv2 analog) on a jittered-stencil pattern DIA refuses.  The
    # 3D-class pattern (run=8) produces an ILU(0) factor with n dependency
    # LEVELS (fully sequential triangular solves) — build_ilu_exact
    # REFUSES it by design (the work budget; round-5 campaign), which is
    # this framework's answer to the reference's own negative result
    # (exact trisolve is a net slowdown even on GPU,
    # plots-and-data.ipynb:723).  Report the refusal, then measure the
    # level-scheduled path on the 2D-class pattern (run=3) it accepts.
    from gmres_tpu.io.synth import unstructured_mesh

    Au3 = unstructured_mesh(512 * 512, run=8)
    try:
        build_ilu_exact(Au3, jnp.float32)
        print("unstructured(run=8): accepted (unexpected at this size)",
              flush=True)
    except ValueError as e:
        print(f"unstructured(run=8) exact ILU REFUSED by work budget "
              f"(designed): {str(e)[:120]}", flush=True)

    # Any jittered-stencil pattern keeps the (i, i-1) chain, so its ILU(0)
    # factor has n levels — refused too.  The pattern class the csrsv2
    # analog (kernels_cuda.cpp:617-695) actually exploits is a SHALLOW
    # dependency DAG: red-black color the 5-point operator (neighbors
    # always alternate color, so each triangular factor has exactly 2
    # levels) — the permuted pattern is scattered (DIA rejects it) and
    # routes the level-scheduled path at full parallelism.
    from gmres_tpu.ops.reorder import permute_symmetric

    ii, jj = np.divmod(np.arange(n, dtype=np.int64), nx)
    color = (ii + jj) & 1
    perm = np.concatenate([np.flatnonzero(color == 0),
                           np.flatnonzero(color == 1)])
    Au = permute_symmetric(A, perm)
    t0 = time.perf_counter()
    try:
        Mu = build_ilu_exact(Au, jnp.float32)
    except ValueError as e:
        print(f"red-black exact ILU refused: {str(e)[:120]}", flush=True)
        print("(no TPU-admissible unstructured exact factor at this size; "
              "the level budget is the designed gate)", flush=True)
        return
    t_build = time.perf_counter() - t0
    print(f"unstructured exact ILU: {type(Mu).__name__} "
          f"(built {t_build:.1f}s)", flush=True)
    wu = rng.standard_normal(Au.n_rows).astype(np.float32)
    Lu = sp.identity(Au.n_rows, format="csr") + build_ilu_jacobi(
        Au, jnp.float32, steps=1).lower.to_scipy().astype(np.float64)
    Uu = build_ilu_jacobi(
        Au, jnp.float32, steps=1).upper.to_scipy().astype(np.float64).tocsr()
    want_u = spla.spsolve_triangular(
        Uu, spla.spsolve_triangular(Lu, wu.astype(np.float64), lower=True),
        lower=False,
    )
    got_u = np.asarray(apply_preconditioner(Mu, jnp.asarray(wu)))  # compile
    t0 = time.perf_counter()
    got_u = np.asarray(apply_preconditioner(Mu, jnp.asarray(wu + 1e-9)))
    t_apply_u = time.perf_counter() - t0
    rel_u = np.linalg.norm(got_u - want_u) / np.linalg.norm(want_u)
    print(f"unstructured exact trisolve apply: {t_apply_u*1e3:.1f} ms "
          f"rel err vs host oracle: {rel_u:.2e}", flush=True)
    assert rel_u < 2e-4, rel_u

    # LEVEL-SCHEDULED path (precond/level_ilu.py — the csrsv2 analog): a
    # shallow-but-wide dependency DAG is the pattern class it exists for.
    # 2048 layers x 128 rows, each row coupled to 5 random rows of the
    # previous layer: 2048 levels x ~760 nnz/level — full sweeps blow the
    # work budget (2048 * 1.55M = 3.2e9 > 2e9) but the level apply pays
    # only sum_c nnz_c.
    from gmres_tpu.precond.level_ilu import LevelILUPrec
    from gmres_tpu.sparse import csr_from_coo

    Lc, R = 2048, 128
    nl = Lc * R
    rows, cols, vals = [], [], []
    for layer in range(Lc):
        base = layer * R
        r = np.arange(base, base + R, dtype=np.int64)
        rows.append(r)
        cols.append(r)
        vals.append(np.full(R, 8.0))
        if layer > 0:
            for _ in range(5):
                rows.append(r)
                cols.append(rng.integers(base - R, base, R))
                vals.append(np.full(R, -1.0))
    Al = csr_from_coo(np.concatenate(rows), np.concatenate(cols),
                      np.concatenate(vals), n_rows=nl, n_cols=nl,
                      sum_duplicates=True)
    t0 = time.perf_counter()
    Ml = build_ilu_exact(Al, jnp.float32)
    print(f"layered-DAG exact ILU: {type(Ml).__name__} "
          f"(built {time.perf_counter()-t0:.1f}s)", flush=True)
    assert isinstance(Ml, LevelILUPrec), type(Ml).__name__
    Mlj = build_ilu_jacobi(Al, jnp.float32, steps=1)
    Ll = sp.identity(nl, format="csr") + Mlj.lower.to_scipy().astype(np.float64)
    Ul = Mlj.upper.to_scipy().astype(np.float64).tocsr()
    wl = rng.standard_normal(nl).astype(np.float32)
    want_l = spla.spsolve_triangular(
        Ul, spla.spsolve_triangular(Ll, wl.astype(np.float64), lower=True),
        lower=False,
    )
    got_l = np.asarray(apply_preconditioner(Ml, jnp.asarray(wl)))  # compile
    t0 = time.perf_counter()
    got_l = np.asarray(apply_preconditioner(Ml, jnp.asarray(wl + 1e-9)))
    t_apply_l = time.perf_counter() - t0
    rel_l = np.linalg.norm(got_l - want_l) / np.linalg.norm(want_l)
    print(f"level-scheduled exact trisolve apply (2048 levels): "
          f"{t_apply_l*1e3:.1f} ms rel err vs host oracle: {rel_l:.2e}",
          flush=True)
    assert rel_l < 2e-4, rel_l


if __name__ == "__main__":
    main()
