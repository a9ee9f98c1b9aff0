#!/usr/bin/env python3
"""Cross-check: run the diverging repeat(1e-2) BENCH config (conv-diff
nx=1024, mixed CGSR identity tol=1e-8 rlen=30) through the rolled CPU
policy path (no post-hoc trigger) and the forced-unrolled path, proving
the divergence recorded in BASELINE.md's round-2 policy table is
config-inherent (reference semantics, IterUtil.hpp:84-137) and not an
artifact of the TPU unrolled path (round-2 VERDICT weak item 7).

Run on CPU:  python scripts/xcheck_repeat_divergence.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from gmres_tpu import GmresConfig, solve
    from gmres_tpu.io.rng import rand_vect
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.ops.spmv import spmv
    import gmres_tpu.solver.gmres as gm

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    A = convection_diffusion_2d(nx, beta=2.0)
    xt = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A, jnp.asarray(xt)))
    cfg = GmresConfig.from_flags(
        mode="mixed", orth="cgsr", prec="identity",
        rlen=30, tol=1e-8, max_restarts=80, rtol=1e-2, repeat_iter=True,
    )
    out = {}
    for name, force in (("rolled", False), ("unrolled", True)):
        gm._FORCE_POLICY_UNROLL = force
        try:
            t0 = time.time()
            res = solve(A, b, cfg, record_history=True)
        finally:
            gm._FORCE_POLICY_UNROLL = False
        ks = [h["k"] for h in res.history]
        print(f"{name}: converged={res.converged} aborted={res.aborted} "
              f"restarts={res.restarts} iters={res.total_iters} "
              f"k[:4]={ks[:4]} rel_final={res.history[-1]['rel_initial']:.3e} "
              f"wall={time.time()-t0:.0f}s", flush=True)
        out[name] = (res.converged, res.aborted, res.restarts,
                     res.total_iters, ks)
    same = out["rolled"] == out["unrolled"]
    print(f"paths agree: {same}")
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
