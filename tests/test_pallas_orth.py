"""Fused Pallas CGS kernels vs the reference numpy formulation
(interpret mode on CPU; compiled path exercised on real TPU by bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_cgsr2_matches_two_pass_reference():
    rng = np.random.default_rng(11)
    m1, n = 31, 64 * 1024
    V = np.zeros((m1, n), np.float32)
    V[:5] = np.linalg.qr(rng.standard_normal((n, 5)))[0].T.astype(np.float32)
    w = rng.standard_normal(n).astype(np.float32)

    from gmres_tpu.ops.pallas.orth_kernel import cgsr2_pallas

    h, w2, hn = cgsr2_pallas(jnp.asarray(V), jnp.asarray(w), interpret=True)

    V64 = V.astype(np.float64)
    u1 = V64 @ w
    w1 = w - u1 @ V64
    u2 = V64 @ w1
    wr = w1 - u2 @ V64
    href = u1 + u2
    scale = float(np.max(np.abs(href)))
    np.testing.assert_allclose(np.asarray(h), href, rtol=1e-3, atol=1e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(w2), wr, rtol=1e-3, atol=1e-4 * float(np.max(np.abs(wr)))
    )
    np.testing.assert_allclose(float(hn), np.linalg.norm(wr), rtol=1e-4)


@pytest.mark.parametrize("R,m1", [(1, 15), (2, 15), (2, 16), (4, 15)])
def test_mgs_kernel_row_batches_match_rolled(R, m1):
    """R-row batching (round-2 VERDICT item 9) must leave the recurrence
    bit-for-bit sequential, including partial last batches (m1 % R != 0)."""
    rng = np.random.default_rng(13)
    n = 32 * 1024
    V = np.zeros((m1, n), np.float32)
    V[:7] = np.linalg.qr(rng.standard_normal((n, 7)))[0].T.astype(np.float32)
    w = rng.standard_normal(n).astype(np.float32)

    from gmres_tpu.ops.pallas.orth_kernel import _mgs

    h, w2, hn = _mgs(jnp.asarray(V), jnp.asarray(w), interpret=True, R=R)
    href = np.zeros(m1, np.float32)
    wr = w.copy()
    for j in range(m1):
        hj = np.float32(np.dot(wr, V[j]))
        wr = wr - hj * V[j]
        href[j] = hj
    scale = max(float(np.max(np.abs(href))), 1e-9)
    np.testing.assert_allclose(np.asarray(h), href, rtol=1e-3, atol=1e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(w2), wr, rtol=1e-3, atol=1e-4 * float(np.max(np.abs(wr)))
    )
    np.testing.assert_allclose(float(hn), np.linalg.norm(np.asarray(w2)),
                               rtol=1e-5)


def test_mgs_kernel_matches_rolled_reference():
    rng = np.random.default_rng(12)
    m1, n = 15, 32 * 1024
    V = np.zeros((m1, n), np.float32)
    V[:6] = np.linalg.qr(rng.standard_normal((n, 6)))[0].T.astype(np.float32)
    w = rng.standard_normal(n).astype(np.float32)

    from gmres_tpu.ops.pallas.orth_kernel import _mgs

    h, w2, hn = _mgs(jnp.asarray(V), jnp.asarray(w), interpret=True)
    np.testing.assert_allclose(
        float(hn), np.linalg.norm(np.asarray(w2)), rtol=1e-5
    )

    href = np.zeros(m1, np.float32)
    wr = w.copy()
    for j in range(m1):
        hj = np.float32(np.dot(wr, V[j]))
        wr = wr - hj * V[j]
        href[j] = hj
    scale = max(float(np.max(np.abs(href))), 1e-9)
    np.testing.assert_allclose(np.asarray(h), href, rtol=1e-3, atol=1e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(w2), wr, rtol=1e-3, atol=1e-4 * float(np.max(np.abs(wr)))
    )


def test_mgs_vmem_gate_never_admits_oversized(monkeypatch):
    """The mgs_profitable gate and _mgs's scratch sizing share one VMEM
    bound, so the gate can never admit a shape whose kernel the compiler
    rejects (round-3 VERDICT weak item 3: the old 40 MB belief admitted
    n=1M at R=2 against the real 16 MB scoped limit and faulted)."""
    from gmres_tpu.ops.pallas import orth_kernel as ok

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for n in (128 * 1024, 512 * 1024, 1024 * 1024, 2 * 1024 * 1024,
              4 * 1024 * 1024, 16 * 1024 * 1024):
        for v_dt, w_dt in ((np.float32, np.float32),
                           (np.dtype(jnp.bfloat16), np.float32)):
            v_item = np.dtype(v_dt).itemsize
            w_item = np.dtype(w_dt).itemsize
            V = jax.ShapeDtypeStruct((31, n), v_dt)
            R = ok.mgs_rows_per_step(n, v_item, w_item)
            if ok.mgs_profitable(V, True, w_item):
                assert R >= 1
                scratch = (w_item + 2 * R * v_item) * n
                assert scratch <= ok._MGS_VMEM_BUDGET, (n, v_dt, scratch)
            else:
                # only ever refused for VMEM (these n pass the size gates)
                assert R == 0 or (n // 128) % ok._STRIPES != 0


def test_mgs_rows_per_step_bench_scale():
    """At the n=1M f32 bench shape the batch must drop to R=1 (R=2 needs
    20 MB > the 16 MB scoped limit — the round-3 hardware fault)."""
    from gmres_tpu.ops.pallas.orth_kernel import mgs_rows_per_step

    assert mgs_rows_per_step(1024 * 1024, 4, 4) == 1
    # small problems keep the R=2 amortization
    assert mgs_rows_per_step(512 * 1024, 4, 4) == 2
    # bf16 basis halves the row-buffer cost: R=2 survives at 1M
    assert mgs_rows_per_step(1024 * 1024, 2, 4) == 2
    # far past the budget even at R=1: callers must fall back
    assert mgs_rows_per_step(16 * 1024 * 1024, 4, 4) == 0


def test_gram2_matches_pair_of_grams():
    """The two-RHS gram kernel (one V sweep for the ICWY MGS step's two
    reductions) equals two single grams."""
    from gmres_tpu.ops.pallas.orth_kernel import _gram, _gram2

    rng = np.random.default_rng(5)
    m1, n = 15, 32 * 1024
    V = np.zeros((m1, n), np.float32)
    V[:6] = rng.standard_normal((6, n)).astype(np.float32)
    w0 = rng.standard_normal(n).astype(np.float32)
    w1 = rng.standard_normal(n).astype(np.float32)
    u0, u1 = _gram2(jnp.asarray(V), jnp.asarray(w0), jnp.asarray(w1),
                    interpret=True)
    r0 = _gram(jnp.asarray(V), jnp.asarray(w0), interpret=True)
    r1 = _gram(jnp.asarray(V), jnp.asarray(w1), interpret=True)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(r0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(r1), rtol=1e-6)


def test_mgs_lowsync_pallas_path_matches_einsum(monkeypatch):
    """mgs_lowsync_step's fused-kernel route (gram2 + update_sumsq)
    reproduces the einsum formulation at f32 (single-device opt-in path,
    round-4: the <=1.28 s MGS target rides this)."""
    import functools

    from gmres_tpu.ops import orth as orth_mod
    from gmres_tpu.ops.pallas import orth_kernel as ok

    rng = np.random.default_rng(7)
    m1, n, k = 12, 32 * 1024, 5
    V = np.zeros((m1, n), np.float32)
    V[: k + 1] = np.linalg.qr(
        rng.standard_normal((n, k + 1))
    )[0].T.astype(np.float32)
    w = rng.standard_normal(n).astype(np.float32)
    L = np.tril(V @ V.T, k=-1).astype(np.float32)
    L[k:] = 0.0

    # einsum reference (the gate refuses off-TPU, so the plain call takes it)
    h_e, w_e, ss_e, L_e = orth_mod.mgs_lowsync_step(
        jnp.asarray(V), k, jnp.asarray(w), jnp.asarray(L), None)

    # force the kernel route in interpret mode
    monkeypatch.setattr(ok, "profitable", lambda V, up=True: True)
    monkeypatch.setattr(
        ok, "_gram2", functools.partial(ok._gram2.__wrapped__, interpret=True))
    monkeypatch.setattr(
        ok, "_update_sumsq",
        functools.partial(ok._update_sumsq.__wrapped__, interpret=True))
    h_p, w_p, ss_p, L_p = orth_mod.mgs_lowsync_step(
        jnp.asarray(V), k, jnp.asarray(w), jnp.asarray(L), None)

    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_e),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_e),
                               rtol=1e-4,
                               atol=1e-4 * float(np.abs(w_e).max()))
    np.testing.assert_allclose(float(ss_p), float(ss_e), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(L_p), np.asarray(L_e),
                               rtol=1e-4, atol=1e-5)


def test_single_device_lowsync_solve_matches_sequential():
    """orth=mgs with low_sync_mgs=True on a single device converges with
    the same history as the sequential recurrence (ICWY is MGS to first
    order; counts must agree on a well-conditioned problem)."""
    from gmres_tpu import GmresConfig, PrecisionSpec, solve
    from gmres_tpu.io.rng import rand_vect
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.ops.spmv import spmv

    A = convection_diffusion_2d(24, beta=1.0)
    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(x_true)))
    base = GmresConfig(
        precision=PrecisionSpec.from_mode("mixed"), orth="mgs",
        precond="identity", restart_length=30, tol=1e-9, max_restarts=60,
    )
    r_seq = solve(A, b, base)
    r_icwy = solve(A, b, base.with_(low_sync_mgs=True))
    assert r_seq.converged and r_icwy.converged
    assert abs(r_seq.restarts - r_icwy.restarts) <= 1
    assert abs(r_seq.total_iters - r_icwy.total_iters) <= 30
