"""Kernel microbenchmark — the reference's ``kernel_perf_test`` capability
(``kernel_perf_test.cpp``: times spmv, dot, dot+axpy "MGS proxy", gemv),
reporting nnz/s and GB/s per chip — the north-star metrics.

Unlike the reference (which evicts caches between single-shot trials), TPU
timing uses jitted repetition loops: each op is run in a device-side chain
long enough to amortize dispatch, which is how steady-state production
behavior looks under jit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial


def device_loop(fn, reps: int):
    """Chain fn reps times on device so host dispatch amortizes.  Returns a
    SCALAR checksum: fetching a concrete value is the only reliable
    completion barrier on remote-device transports (block_until_ready can
    return before the computation drains there)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=())
    def run(*args):
        def body(i, a):
            r = fn(*a)
            return r if isinstance(r, tuple) else (r,)

        out = jax.lax.fori_loop(0, reps, body, args)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
        return sum(
            jnp.sum(x.reshape(-1)[:1].astype(jnp.float32)) for x in leaves
        )

    return run


def device_loop_op(fn, reps: int):
    """Like device_loop, but the first argument is a stationary operand
    (closed over inside the traced function, carried nowhere)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=())
    def run(op, *args):
        def body(i, a):
            r = fn(op, *a)
            return r if isinstance(r, tuple) else (r,)

        out = jax.lax.fori_loop(0, reps, body, args)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
        return sum(
            jnp.sum(x.reshape(-1)[:1].astype(jnp.float32)) for x in leaves
        )

    return run


# Per-execution device-time budget: the v5e worker kills any single XLA
# execution past ~60 s (probe_csr_fault.py / probe_exec_watchdog.py);
# stay far under it so tunnel variance can't push a measurement over.
MAX_DEVICE_SECONDS = 20.0


def time_op(run, args, reps: int, warmup: int = 1) -> float:
    import numpy as np

    for _ in range(warmup):
        float(np.asarray(run(*args)))
    t0 = time.perf_counter()
    float(np.asarray(run(*args)))
    return (time.perf_counter() - t0) / reps


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gmres-bench-kernels")
    ap.add_argument("--Apath", default=None)
    ap.add_argument("--synth", default="convdiff:1024")
    ap.add_argument("--vcols", type=int, default=31, help="basis width for gemv")
    ap.add_argument("--trials", type=int, default=50)
    ap.add_argument("--rand", type=int, default=42)
    ap.add_argument("--device", choices=["tpu", "cpu"], default="tpu")
    ap.add_argument("--reorder", choices=["rcm"], default=None,
                    help="apply a bandwidth-reducing RCM permutation before "
                         "format dispatch — the unlock for scattered "
                         "patterns SELL packs badly (solve(reorder='rcm') "
                         "semantics at the kernel level)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from gmres_tpu.cli.solve import make_synth
    from gmres_tpu.io.loader import load_matrix
    from gmres_tpu.io.rng import rand_vect
    from gmres_tpu.ops.blas import nrm2
    from gmres_tpu.ops.spmv import spmv

    A64 = make_synth(args.synth) if args.synth and not args.Apath else load_matrix(args.Apath)
    if args.reorder == "rcm":
        from gmres_tpu.ops.reorder import permute_symmetric, rcm_permutation

        t0 = time.perf_counter()
        perm = rcm_permutation(A64)
        A64 = permute_symmetric(A64, perm)
        print(f"RCM reorder applied ({time.perf_counter()-t0:.1f}s)",
              file=sys.stderr)
    n, nnz = A64.n_rows, A64.nnz
    reps = args.trials
    print(f"matrix: n={n:,} nnz={nnz:,}; reps={reps}", file=sys.stderr)

    x = jnp.asarray(rand_vect(n, args.rand))
    results = {}

    from gmres_tpu.ops.dia import from_csr

    dia64 = from_csr(A64)
    formats = [("csr", A64)] + ([("dia", dia64)] if dia64 is not None else [])
    if dia64 is None:
        # unstructured fast path (VERDICT round-1 item 1): SELL via the
        # windowed-compare / dense-block Pallas kernels, f32 only
        from gmres_tpu.ops.sell import sell_from_csr

        t0 = time.perf_counter()
        # (W, K) overrides for hardware A/B sweeps; default autotunes
        import os as _os

        _w = _os.environ.get("GMRES_TPU_SELL_W")
        _k = _os.environ.get("GMRES_TPU_SELL_K")
        sell = sell_from_csr(A64, W=int(_w) if _w else None,
                             K=int(_k) if _k else None)
        if sell is not None:
            print(f"SELL pack: W={sell.W} K={sell.K} chunks={sell.n_chunks} "
                  f"dense={sell.n_dense_chunks} "
                  f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)
            # SELL first: at >10M nnz the XLA CSR gather chain can fault
            # the TPU worker; capture the fast-path number before risking it
            formats.insert(0, ("sell", sell))
    for fmt_name, A0 in formats:
        for dt_name, dt in (("f64", jnp.float64), ("f32", jnp.float32),
                            ("bf16", jnp.bfloat16)):
            if fmt_name == "sell" and dt != jnp.float32:
                continue
            # The v5e worker kills any SINGLE XLA execution running past
            # ~60 s (round-5 probes: a 25M-nnz f64 gather+segment-sum is
            # fine one-shot OR chunked, but 50 of them in one fori loop
            # fault the worker — scripts/probe_csr_fault.py.  Rounds 2-4
            # misattributed this to gather SIZE).  Time one rep first and
            # cap the in-loop rep count so one execution stays well under
            # the limit; slow paths (XLA csr f64, ~1.5 s/rep at 25M nnz)
            # then measure over fewer in-loop reps instead of crashing.
            A = jax.device_put(A0.astype(dt))
            xd = x.astype(dt)
            # A rides as a jit ARGUMENT: closing over it would bake the
            # operator arrays into the HLO as constants (hundreds of MB
            # through the remote compile service); carrying it in the fori
            # loop would copy it per iteration.  The 0.125 scale keeps the
            # chained values from overflowing (rho(A)^reps) and fuses into
            # the SpMV epilogue.
            step_fn = lambda a, v: spmv(a, v) * dt(0.125)
            try:
                t1 = time_op(device_loop_op(step_fn, 1), (A, xd), 1)
                reps_eff = max(1, min(reps, int(MAX_DEVICE_SECONDS / max(t1, 1e-9))))
                if reps_eff >= 2:
                    run = device_loop_op(step_fn, reps_eff)
                    t = time_op(run, (A, xd), reps_eff)
                else:
                    t = t1
                    reps_eff = 1
                if reps_eff < reps:
                    print(f"  ({fmt_name} {dt_name}: {reps_eff} in-loop reps"
                          f" — {t1:.2f}s/rep vs the ~60s per-execution"
                          f" worker limit)", file=sys.stderr)
            except Exception as e:  # TPU worker faults on some XLA paths
                print(f"spmv {fmt_name} {dt_name}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", file=sys.stderr)
                continue
            itemsize = jnp.dtype(dt).itemsize
            bytes_per = nnz * (itemsize + 4) + n * 2 * itemsize  # vals+cols+x+y
            results[f"spmv_{fmt_name}_{dt_name}"] = dict(
                seconds=t, nnz_per_s=nnz / t, gb_per_s=bytes_per / t / 1e9
            )
            print(f"spmv {fmt_name} {dt_name}: {t*1e6:8.1f} us  {nnz/t:.3e} nnz/s "
                  f"{bytes_per/t/1e9:7.1f} GB/s", file=sys.stderr)

    for dt_name, dt in (("f64", jnp.float64), ("f32", jnp.float32)):
        xd = jax.device_put(x.astype(dt))
        y = jax.device_put((x * 0.5).astype(dt))

        # stationary operands are closed over (jit constants), only the
        # evolving value is carried — a carried pytree copies per iteration.
        # ``blas.dot`` is what the solver calls: on TPU fp64 inputs at
        # n >= 64K it rides the streaming df64 pair kernel (round-5; the
        # raw XLA fp64 dot is software-emulated at ~2.7 GB/s and is
        # reported separately as the strict-IEEE reference row).
        from gmres_tpu.ops.blas import dot as blas_dot

        def dot_step(acc):
            return acc * 1e-9 + blas_dot(xd, y)

        run = device_loop(dot_step, reps)
        t = time_op(run, (jnp.zeros((), dt),), reps)
        results[f"dot_{dt_name}"] = dict(seconds=t, gb_per_s=2 * n * jnp.dtype(dt).itemsize / t / 1e9)
        print(f"dot  {dt_name}: {t*1e6:8.1f} us  {2*n*jnp.dtype(dt).itemsize/t/1e9:7.1f} GB/s",
              file=sys.stderr)

        if dt == jnp.float64:
            def dot_strict_step(acc):
                return acc * 1e-9 + jnp.dot(
                    xd, y, precision=jax.lax.Precision.HIGHEST)

            run = device_loop(dot_strict_step, reps)
            t = time_op(run, (jnp.zeros((), dt),), reps)
            results["dot_f64_strict"] = dict(
                seconds=t, gb_per_s=2 * n * 8 / t / 1e9)
            print(f"dot  f64 strict(xla): {t*1e6:8.1f} us  "
                  f"{2*n*8/t/1e9:7.1f} GB/s", file=sys.stderr)

        # MGS proxy: dot + axpy (the sequential recurrence's inner step,
        # using the library dot like solver/gmres.py does)
        def mgs_step(w):
            h = blas_dot(w, y)
            return w - h * y

        run = device_loop(mgs_step, reps)
        t = time_op(run, (xd,), reps)
        results[f"dot_axpy_{dt_name}"] = dict(seconds=t)
        print(f"mgs  {dt_name}: {t*1e6:8.1f} us", file=sys.stderr)

        # CGS proxy: Gram reduction + rank-1 update against an m x n basis
        # (VPU elementwise+reduce formulation, like ops/orth.py)
        V = jax.device_put(jnp.tile(y[None, :], (args.vcols, 1)))

        def cgs_step(w):
            u = jnp.sum(V * w[None, :], axis=1)
            return w - jnp.sum(u[:, None] * V, axis=0)

        run = device_loop(cgs_step, reps)
        t = time_op(run, (xd,), reps)
        bytes_per = 2 * args.vcols * n * jnp.dtype(dt).itemsize
        results[f"gemv2_{dt_name}"] = dict(seconds=t, gb_per_s=bytes_per / t / 1e9)
        print(f"cgs  {dt_name} (m={args.vcols}): {t*1e6:8.1f} us  "
              f"{bytes_per/t/1e9:7.1f} GB/s", file=sys.stderr)

        # fused Pallas CGSR step (3 basis sweeps) where supported
        if dt == jnp.float32:
            from gmres_tpu.ops.pallas.orth_kernel import (
                cgsr2_pallas,
                profitable,
            )

            if profitable(V):
                def cgsr_step(w):
                    h, w2, hn = cgsr2_pallas(V, w)
                    return w2 / (hn + 1)

                run = device_loop(cgsr_step, reps)
                t = time_op(run, (xd,), reps)
                bytes_per = 3 * args.vcols * n * jnp.dtype(dt).itemsize
                results[f"cgsr2_pallas_{dt_name}"] = dict(
                    seconds=t, gb_per_s=bytes_per / t / 1e9
                )
                print(f"cgsr2 pallas {dt_name}: {t*1e6:8.1f} us  "
                      f"{bytes_per/t/1e9:7.1f} GB/s", file=sys.stderr)

                # compressed-basis variant (CB-GMRES, PrecisionSpec.basis):
                # V stored bf16, w/H f32 — the SAME fused step at half the
                # basis traffic; the delta vs cgsr2_pallas_f32 is the CB
                # tier's per-iteration win
                Vb = jax.device_put(V.astype(jnp.bfloat16))

                def cgsr_cb_step(w):
                    h, w2, hn = cgsr2_pallas(Vb, w)
                    return w2 / (hn + 1)

                run = device_loop(cgsr_cb_step, reps)
                t = time_op(run, (xd,), reps)
                bytes_per = 3 * args.vcols * n * 2
                results["cgsr2_pallas_cb_bf16V"] = dict(
                    seconds=t, gb_per_s=bytes_per / t / 1e9
                )
                print(f"cgsr2 pallas cb(bf16 V): {t*1e6:8.1f} us  "
                      f"{bytes_per/t/1e9:7.1f} GB/s", file=sys.stderr)

    if args.json:
        print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
