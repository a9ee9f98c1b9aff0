#!/usr/bin/env python3
"""Confirm the v5e worker's single-execution time limit (round-5).

probe_csr_fault.py showed the mesh3d csr-f64 crash is NOT about gather
size: one 25.2M-nnz f64 gather+segment-sum passes (one-shot AND chunked),
but the same op under a 50-rep fori loop (~60-100 s on device) kills the
worker.  Hypothesis: any single XLA execution beyond ~60 s is killed
(watchdog), independent of the op.  Test with a CHEAP op (small dense
matmul chain) looped to target wall times of ~15/40/70/120 s.
"""
import subprocess
import sys
import time

TRIAL = r"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
reps = int(sys.argv[1])
x = jax.device_put(np.random.default_rng(0).standard_normal((2048, 2048)).astype(np.float32))
@jax.jit
def run(x, reps):
    def it(_, v):
        return 0.5 * (v @ v) / jnp.maximum(jnp.max(jnp.abs(v)), 1e-30)
    return jax.lax.fori_loop(0, reps, it, x)
# calibrate with a short run first
t0 = time.time(); np.asarray(run(x, 50)); t1 = time.time() - t0
print(f"50 reps: {t1:.2f}s -> {t1/50*1000:.2f} ms/rep", flush=True)
t0 = time.time(); out = np.asarray(run(x, reps))
print(f"{reps} reps: {time.time()-t0:.1f}s ok ({float(out[0,0]):.3e})", flush=True)
"""


def main():
    # ~1.5 ms/rep for a 2048^2 matmul chain on v5e -> pick rep counts
    for reps in (10_000, 30_000, 50_000, 80_000):
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", TRIAL, str(reps)],
                           capture_output=True, text=True, timeout=900)
        ok = r.returncode == 0
        print(f"reps={reps}: {'ok' if ok else 'FAULT'} "
              f"({time.time()-t0:.0f}s total)", flush=True)
        for line in (r.stdout or "").splitlines():
            print("   ", line, flush=True)
        if not ok:
            err = (r.stderr or "").strip().splitlines()
            print("   ", err[-1][:140] if err else "(no stderr)", flush=True)
            # recovery poll
            while True:
                p = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp; import numpy as np;"
                     "print(float(np.asarray(jnp.ones((8,8)).sum())))"],
                    capture_output=True, text=True, timeout=240)
                if p.returncode == 0:
                    break
                time.sleep(15)
    return 0


if __name__ == "__main__":
    sys.exit(main())
