#!/usr/bin/env python3
"""Pin the XLA-gather fault boundary on the v5e worker, per dtype.

Round-2 probed f32 only: one >16M-element gather (64 MB output)
reproducibly kills the TPU worker, hence GATHER_CHUNK_NNZ = 8M elements.
The round-5 campaign showed the boundary is in BYTES, not elements: the
8M-element f64 chunks (64 MB) of ``csr_spmv_chunked`` and even condest's
one-shot 6.3M-element f64 gather (50 MB) fault the worker identically.

Each trial runs in a FRESH subprocess (a fault kills the worker; the
parent then polls until the worker restarts before the next trial), so
one run maps the pass/fail boundary without manual babysitting.

Usage: python scripts/probe_gather_f64.py [dtype ...]  (default: f64 f32)
"""
import subprocess
import sys
import time

TRIAL = r"""
import sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
dt = dict(f32=jnp.float32, f64=jnp.float64)[sys.argv[1]]
m = int(sys.argv[2])          # gather output elements
n = 262_144                   # source vector length (condest-shaped)
x = jax.device_put(np.random.default_rng(0).standard_normal(n).astype(dt))
idx = jax.device_put(np.random.default_rng(1).integers(0, n, m).astype(np.int32))
f = jax.jit(lambda x, i: x[i].sum())
print("result:", float(f(x, idx)))
"""


def worker_up(timeout=300):
    t0 = time.time()
    while time.time() - t0 < timeout:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; import numpy as np;"
             "print(float(np.asarray(jnp.ones((8,8)).sum())))"],
            capture_output=True, text=True, timeout=240)
        if r.returncode == 0:
            return True
        time.sleep(15)
    return False


def main():
    dtypes = sys.argv[1:] or ["f64", "f32"]
    sizes_m = [1, 2, 3, 4, 5, 6, 8, 12, 16, 20]
    for dt in dtypes:
        for m in sizes_m:
            n_el = m * 1024 * 1024
            mb = n_el * (8 if dt == "f64" else 4) / 1e6
            r = subprocess.run(
                [sys.executable, "-c", TRIAL, dt, str(n_el)],
                capture_output=True, text=True, timeout=600)
            ok = r.returncode == 0
            tag = "ok" if ok else "FAULT"
            print(f"gather {dt} {m}M elems ({mb:.0f} MB out): {tag}",
                  flush=True)
            if not ok:
                err = (r.stderr or "").strip().splitlines()
                print("   ", err[-1][:120] if err else "(no stderr)",
                      flush=True)
                if not worker_up():
                    print("worker did not recover; aborting", flush=True)
                    return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
