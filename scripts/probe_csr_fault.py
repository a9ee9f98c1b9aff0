#!/usr/bin/env python3
"""Bisect the mesh3d@1M csr-f64 TPU worker crash (round-5 campaign).

probe_gather_f64.py showed a bare gather NEVER faults (20M f64 elems,
168 MB out: ok) — so the round-2 "one >16M-element gather faults the
worker" diagnosis was incomplete.  The campaign crash reproduces in
``csr_spmv_chunked`` (gather + multiply + sorted segment-sum, 8M-elem
f64 slices, 50 reps under a fori loop); this probe isolates which piece:

  seg1       one segment_sum of the full 25.2M-nnz product, 1 call
  chunk1     csr_spmv_chunked shape (4 slices), 1 call
  chunk50    the exact bench shape: chunked under a 50-rep fori loop
  one50      one-shot under the fori loop
  seg1_f32   the f32 one-shot (round-2 blamed >16M f32 gathers)

Matrix shape matches mesh3d@1M: n=1,048,576 rows, 25,151,458 nnz,
row-sorted indices (synthetic random pattern — the crash should be
pattern-independent).  Fresh subprocess per trial + worker-recovery
polling, like probe_gather_f64.py.
"""
import subprocess
import sys
import time

TRIAL = r"""
import sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
mode = sys.argv[1]
n = 1_048_576
nnz = 25_151_458
rng = np.random.default_rng(0)
dt = jnp.float32 if mode.endswith("f32") else jnp.float64
# row-sorted ids: ~nnz/n per row, exact total
counts = np.full(n, nnz // n, np.int64)
counts[: nnz - counts.sum()] += 1
row_ids = jax.device_put(np.repeat(np.arange(n, dtype=np.int32), counts))
col = jax.device_put(rng.integers(0, n, nnz).astype(np.int32))
vals = jax.device_put(rng.standard_normal(nnz).astype(dt))
x = jax.device_put(rng.standard_normal(n).astype(dt))

def one_shot(vals, col, row_ids, x):
    return jax.ops.segment_sum(vals * x[col], row_ids, num_segments=n,
                               indices_are_sorted=True)

def chunked(vals, col, row_ids, x):
    y = jnp.zeros((n,), dt)
    c = 8 * 1024 * 1024
    for lo in range(0, nnz, c):
        hi = min(lo + c, nnz)
        y = y + jax.ops.segment_sum(vals[lo:hi] * x[col[lo:hi]],
                                    row_ids[lo:hi], num_segments=n,
                                    indices_are_sorted=True)
    return y

def loop50(body):
    def run(vals, col, row_ids, x):
        def it(_, v):
            return body(vals, col, row_ids, v) * dt(0.125)
        return jax.lax.fori_loop(0, 50, it, x)
    return run

fn = {"seg1": one_shot, "chunk1": chunked,
      "chunk50": loop50(chunked), "one50": loop50(one_shot),
      "seg1_f32": one_shot}[mode]
out = jax.jit(fn)(vals, col, row_ids, x)
print("sum:", float(jnp.sum(out)))
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
    modes = sys.argv[1:] or ["seg1", "chunk1", "chunk50", "one50",
                             "seg1_f32"]
    for mode in modes:
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", TRIAL, mode],
                           capture_output=True, text=True, timeout=1200)
        ok = r.returncode == 0
        print(f"{mode}: {'ok' if ok else 'FAULT'} ({time.time()-t0:.0f}s)",
              flush=True)
        if not ok:
            err = (r.stderr or "").strip().splitlines()
            print("   ", err[-1][:140] if err else "(no stderr)", flush=True)
            if not worker_up():
                print("worker did not recover; aborting", flush=True)
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
