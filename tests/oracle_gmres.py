"""Independent numpy GMRES oracle for golden iteration-count validation.

This is a deliberately naive, dense-arithmetic transcription of the
reference algorithm's operation sequence — ``gmres.cpp:24-245`` (baseline
and singleUpdate drivers), ``Orthogonalization.hpp:76-136`` (CGS/MGS/CGSR
kernels), ``IterUtil.hpp:17-227`` (the four convergence/restart policies)
— sharing NO code with ``gmres_tpu``.  Golden tests
(``test_golden_oracle.py``) assert the framework reproduces the oracle's
(restarts, total_iters) on synthetic problems, which pins the algorithm
semantics offline: published-table parity for SuiteSparse matrices stays
in ``test_golden_histories.py`` (MTXDIR-gated), but the *algorithm* is
cross-validated against an implementation written straight from the
reference sources.

Precision model (``gmres.cpp:135-245`` gmres_singleUpdate): the outer
residual ``r = b - A x`` is fp64 against the fp64 operator; everything
inside a cycle — basis, Hessenberg, Givens, the solution increment —
is fp32 against the fp32 copy of A; the increment is promoted to fp64
and accumulated into x (``Orthogonalization.hpp:67-73 update_x``).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _rotg(a, b, dt):
    """BLAS-style Givens generation (cblas_drotg semantics: r carries the
    sign of the larger-magnitude input; kernels_mkl.cpp uses cblas rotg)."""
    a = dt(a)
    b = dt(b)
    if b == 0 and a == 0:
        return dt(1), dt(0), dt(0)
    roe = b if abs(b) > abs(a) else a
    scale = abs(a) + abs(b)
    r = np.sign(roe) * scale * np.sqrt((a / scale) ** 2 + (b / scale) ** 2)
    r = dt(r)
    c = dt(a / r)
    s = dt(b / r)
    return c, s, r


class _Fixed:
    """Base Convergence (IterUtil.hpp:17-81): fixed restart length."""

    def __init__(self, tol, rlen, max_restarts):
        self.tol = tol
        self.rlen = rlen
        self.max_restarts = max_restarts
        self.total_iters = 0
        self.total_restarts = 0

    def setup(self, v):
        self.total_iters = 0

    def check_initial(self, r_norm, normalization, beta, minvb_norm):
        self.total_restarts += 1
        if self.total_restarts > self.max_restarts:
            return "aborted"
        if r_norm / normalization > self.tol:
            return "next"
        return "converged"

    def check(self, k, prec_res, minvb_norm):
        self.total_iters += 1
        if self.rlen <= k:
            return "restart"
        return "next"


class _Repeat(_Fixed):
    """RepeatIteration_Convergence (IterUtil.hpp:84-137): the first cycle
    runs until the relative preconditioned residual improves by rtol; every
    later cycle repeats that first cycle's length."""

    def __init__(self, tol, rtol, rlen, max_restarts):
        super().__init__(tol, rlen, max_restarts)
        self.rtol = rtol
        self.restart_tol = rtol
        self.second_rlen = 0
        self.first = True

    def check_initial(self, r_norm, normalization, beta, minvb_norm):
        if self.first:
            self.restart_tol = beta / minvb_norm * self.rtol
        return super().check_initial(r_norm, normalization, beta, minvb_norm)

    def check(self, k, prec_res, minvb_norm):
        if self.first:
            act = super().check(k, prec_res, minvb_norm)
            if act != "next":
                self.first = False
                self.second_rlen = k
                return act
            if prec_res / minvb_norm <= self.restart_tol:
                self.first = False
                self.second_rlen = k
                return "restart"
            return "next"
        act = super().check(k, prec_res, minvb_norm)
        if act != "next":
            return act
        if self.second_rlen <= k:
            return "restart"
        return "next"


class _RelRes(_Fixed):
    """RelPrecRes_Convergence (IterUtil.hpp:139-169): restart whenever the
    cycle improves the preconditioned residual by rtol (re-anchored at
    every outer iteration)."""

    def __init__(self, tol, rtol, rlen, max_restarts):
        super().__init__(tol, rlen, max_restarts)
        self.rtol = rtol
        self.restart_tol = rtol

    def check_initial(self, r_norm, normalization, beta, minvb_norm):
        self.restart_tol = beta / minvb_norm * self.rtol
        return super().check_initial(r_norm, normalization, beta, minvb_norm)

    def check(self, k, prec_res, minvb_norm):
        act = super().check(k, prec_res, minvb_norm)
        if act != "next":
            return act
        if prec_res / minvb_norm <= self.restart_tol:
            return "restart"
        return "next"


class _OrthLoss(_Fixed):
    """LostOrthogonality_Convergence (IterUtil.hpp:172-227): accumulate the
    S-recurrence estimate of orthogonality loss; restart when the running
    sum of squares crosses rtol^2."""

    def __init__(self, tol, rtol, rlen, max_restarts):
        super().__init__(tol, rlen, max_restarts)
        self.rtol_sq = rtol * rtol
        self.v = None
        self.S = None
        self.loss_sq = 0.0

    def setup(self, v):
        super().setup(v)
        self.v = v
        self.S = np.zeros((self.rlen + 1, self.rlen + 1), dtype=v.dtype)

    def check_initial(self, r_norm, normalization, beta, minvb_norm):
        self.loss_sq = 0.0
        return super().check_initial(r_norm, normalization, beta, minvb_norm)

    def check(self, k, prec_res, minvb_norm):
        act = super().check(k, prec_res, minvb_norm)
        if act != "next":
            return act
        # u = V[:, :k+1]^T v_{k+1};  s = u - S[:k+1,:k+1] u;  loss += |s|^2.
        # NOTE: IterUtil.hpp:206-209's literal index (this check's k + 1)
        # would read a basis column not yet written this cycle; both the
        # framework (solver/gmres.py orthloss branch) and this oracle use
        # the just-written column v_{k+1} of the inner loop — the
        # recurrence the class is clearly intended to compute.
        kk = k  # caller passes inner-loop k+1
        u = self.v[:, :kk].T @ self.v[:, kk]
        s_col = u - self.S[:kk, :kk] @ u
        self.S[:kk, kk] = s_col
        self.loss_sq += float(s_col @ s_col)
        if self.loss_sq >= self.rtol_sq:
            return "restart"
        return "next"


def _ilu0_dense(A64: np.ndarray) -> np.ndarray:
    """Dense ILU(0): the textbook row-wise IKJ factorization restricted to
    the pattern of A (``kernels_mkl.cpp`` merge-loop semantics; fp64
    compute like the reference's csrilu02 contract).  Returns the combined
    factor matrix (unit-lower L strict part below the diagonal, U on and
    above)."""
    F = np.array(A64, dtype=np.float64)
    mask = A64 != 0
    n = F.shape[0]
    for i in range(1, n):
        ks = np.flatnonzero(mask[i, :i])
        for k in ks:
            F[i, k] = F[i, k] / F[k, k]
            js = np.flatnonzero(mask[i, k + 1:]) + k + 1
            F[i, js] -= F[i, k] * F[k, js]
    return F


def _orthogonalize(orth, V, k, w, h, dt):
    """Orthogonalization.hpp kernels, same operation order.  Basis reads
    dequantize to the working dtype (``V`` may be stored compressed —
    CB-GMRES bf16 basis; a same-dtype astype is exact)."""
    if orth == "cgs":
        Vk = V[:, : k + 1].astype(dt)
        hc = Vk.T @ w
        w -= Vk @ hc
        h[: k + 1, k] = hc
    elif orth == "mgs":
        for j in range(k + 1):
            vj = V[:, j].astype(dt)
            hjk = dt(w @ vj)
            w -= hjk * vj
            h[j, k] = hjk
    elif orth == "cgsr":  # two CGS sweeps, weights accumulated (orth_steps=2)
        Vk = V[:, : k + 1].astype(dt)
        hc = Vk.T @ w
        w -= Vk @ hc
        wt = Vk.T @ w
        w -= Vk @ wt
        h[: k + 1, k] = hc + wt
    else:
        raise ValueError(orth)
    return w


@dataclasses.dataclass
class OracleResult:
    converged: bool
    aborted: bool
    restarts: int   # the reference's outer index i (= total_restarts - 1):
                    # the convention the framework's res.restarts reports
    total_iters: int
    x: np.ndarray
    rel_prec_res: float


def oracle_solve(A64: np.ndarray, b: np.ndarray, tol: float, rlen: int,
                 max_restarts: int, orth: str = "cgsr",
                 mode: str = "baseline", policy: str = "fixed",
                 rtol: float = 0.0, inv_diag: np.ndarray | None = None,
                 ilu_jacobi_steps: int = 0, basis_dtype=None,
                 ) -> OracleResult:
    """Dense restarted GMRES following gmres.cpp exactly.

    ``mode`` — the four reference precision configurations
    (``gmres_perf_test.cpp:31-36,228-305``; SURVEY.md §2.2):
      'baseline'    all fp64 (gmres_baseline<double,double>)
      'mixed'       gmres_singleUpdate: fp64 outer residual, fp32 cycle
      'single-prec' gmres_baseline<double,float>: all-fp64 solver, fp32
                    preconditioner through the typesafe round-trip
                    (gmres.cpp:12-17)
      'single'      all fp32 (gmres_baseline<float,float>)
    ``inv_diag``: Jacobi preconditioner; ``ilu_jacobi_steps > 0``:
    ILU(0)-Jacobi preconditioner with that many sweeps per triangle
    (portable-kernel semantics, ``kernels.hpp``: L-phase x <- b - Ls x;
    U-phase x <- x + D^{-1}(b' - U x)); None/0 = identity.
    ``basis_dtype``: storage dtype for the Krylov basis (CB-GMRES: pass
    ml_dtypes.bfloat16 to model the framework's ``PrecisionSpec.basis``
    compressed-basis tier; reads dequantize to the working dtype).
    ``policy`` + ``rtol`` select the Convergence subclass.
    """
    n = b.shape[0]
    hi = np.float32 if mode == "single" else np.float64
    lo = np.float32 if mode in ("mixed", "single") else np.float64
    prec_dt = (np.float32 if mode in ("mixed", "single", "single-prec")
               else np.float64)
    A_hi = np.asarray(A64, dtype=hi)
    A_lo = A_hi.astype(lo)
    b = np.asarray(b, dtype=hi)
    Md_p = None if inv_diag is None else np.asarray(inv_diag, dtype=prec_dt)

    if ilu_jacobi_steps:
        F = _ilu0_dense(A_hi).astype(prec_dt)  # fp64 factorize + downcast
        Ls = np.tril(F, -1)
        U = np.triu(F)
        invd = (1.0 / np.diag(F)).astype(prec_dt)

        def M_prec(w):
            bb = w
            x = bb
            for _ in range(ilu_jacobi_steps):
                x = bb - Ls @ x
            b2 = x
            for _ in range(ilu_jacobi_steps):
                x = x + invd * (b2 - U @ x)
            return x
    else:
        def M_prec(w):
            return w if Md_p is None else w * Md_p

    def M_apply(w):
        # typesafe_apply (gmres.cpp:12-22): the preconditioner computes in
        # its own dtype; cross-dtype callers round-trip through copies
        return M_prec(w.astype(prec_dt)).astype(w.dtype)

    conv = {
        "fixed": lambda: _Fixed(tol, rlen, max_restarts),
        "repeat": lambda: _Repeat(tol, rtol, rlen, max_restarts),
        "relres": lambda: _RelRes(tol, rtol, rlen, max_restarts),
        "orthloss": lambda: _OrthLoss(tol, rtol, rlen, max_restarts),
    }[policy]()

    V = np.zeros((n, rlen + 1), dtype=basis_dtype or lo)
    conv.setup(V)

    x = np.zeros(n, dtype=hi)
    b_norm = np.linalg.norm(b)
    minvb_norm = float(np.linalg.norm(M_apply(b.astype(lo)).astype(hi)))
    a_norm = float(np.linalg.norm(A_lo if mode == "mixed" else A_hi))

    i = 0
    while True:
        r = b - A_hi @ x                      # fp64 outer residual
        r_norm = float(np.linalg.norm(r))
        w = M_apply(r.astype(lo))
        beta = float(np.linalg.norm(w.astype(hi)))
        x_norm = float(np.linalg.norm(x))

        act = conv.check_initial(r_norm, b_norm + a_norm * x_norm, beta,
                                 minvb_norm)
        if act in ("converged", "aborted"):
            return OracleResult(act == "converged", act == "aborted",
                                conv.total_restarts - 1, conv.total_iters, x,
                                beta / minvb_norm)

        # first_vector
        if beta != 0:
            V[:, 0] = (w / lo(beta)).astype(lo)
        else:
            V[:, 0] = 0
        h = np.zeros((rlen + 1, rlen), dtype=lo)
        s = np.zeros(rlen + 1, dtype=lo)
        s[0] = lo(beta)
        cos = np.zeros(rlen + 1, dtype=lo)
        sin = np.zeros(rlen + 1, dtype=lo)

        k = 0
        while True:
            w = M_apply((A_lo @ V[:, k].astype(lo)).astype(lo))
            w = _orthogonalize(orth, V, k, w, h, lo)
            h_final = lo(np.linalg.norm(w))  # nrm2 in working precision
            h[k + 1, k] = h_final
            V[:, k + 1] = (w / h_final).astype(lo)

            # apply previous rotations to column k, generate the new one
            for j in range(k):
                t1 = cos[j] * h[j, k] + sin[j] * h[j + 1, k]
                t2 = -sin[j] * h[j, k] + cos[j] * h[j + 1, k]
                h[j, k], h[j + 1, k] = lo(t1), lo(t2)
            c, sn, rr = _rotg(h[k, k], h[k + 1, k], lo)
            cos[k], sin[k] = c, sn
            h[k, k], h[k + 1, k] = rr, lo(0)
            t1 = c * s[k] + sn * s[k + 1]
            t2 = -sn * s[k] + c * s[k + 1]
            s[k], s[k + 1] = lo(t1), lo(t2)

            arnoldi_residual = float(abs(s[k + 1]))
            act = conv.check(k + 1, arnoldi_residual, minvb_norm)
            if act == "converged":
                x = _update(x, V, h, s, k + 1, lo, hi)
                return OracleResult(True, False, conv.total_restarts - 1,
                                    conv.total_iters, x,
                                    arnoldi_residual / minvb_norm)
            if act == "aborted":
                return OracleResult(False, True, conv.total_restarts - 1,
                                    conv.total_iters, x,
                                    arnoldi_residual / minvb_norm)
            if act == "restart":
                k += 1
                break
            k += 1

        x = _update(x, V, h, s, k, lo, hi)
        i += 1


def _update(x, V, h, s, k, lo, hi):
    """solution_update (gmres.cpp:276-303): back-substitution on the k x k
    upper triangle, then x += V[:, :k] y (promoted in the mixed scheme)."""
    y = s[:k].copy()
    for j in range(k - 1, -1, -1):
        y[j] = lo((y[j] - h[j, j + 1 : k] @ y[j + 1 : k]) / h[j, j])
    inc = (V[:, :k].astype(lo) @ y).astype(lo)
    return x + inc.astype(hi)
