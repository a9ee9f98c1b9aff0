#!/bin/bash
# Round-5 hardware measurement campaign (run on the real TPU chip).
#
# Addresses the round-4 VERDICT's ten asks with one resumable driver:
#   1. distributed SELL retention after the multi-part per-shard fix
#   2. SELL zero-knob throughput (auto-G now resolves 16) + W=128 A/B
#   3. >16M-nnz CSR rows measured through the chunked-gather gate
#   4. scattered (mesh) pattern through RCM at the kernel level
#   5. exact-ILU trisolve vs ILU-Jacobi(3) on chip (+ unstructured factor)
#   6. default (auto-lowsync) MGS headline <= 1.28 s + sequential parity cost
#   7. df64 fast dot: fp64 BLAS-1 rows at f32 bandwidth
#   8. staged-vs-unstaged single-device solve (the 0.79x dist anomaly)
#   9. baseline pinning: bench.py medians the fp64 baseline across runs
#  10. condest on chip (convdiff + mesh3d property rows)
set -u
cd "$(dirname "$0")/.."
# PREPEND the repo root: overwriting PYTHONPATH would drop the host's
# sitecustomize dir (/root/.axon_site) that registers the TPU tunnel backend
export PYTHONPATH=".${PYTHONPATH:+:$PYTHONPATH}"
# persistent XLA compilation cache: every step is a fresh process, and
# remote compiles through the tunnel dominated step wall time without it
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
OUT=results/round5
mkdir -p "$OUT"

CONSEC_TIMEOUTS=0
step() {  # step <name> <timeout-s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  local log="$OUT/$name.txt"
  if grep -q "CAMPAIGN-STEP-OK" "$log" 2>/dev/null; then
    echo "== $name: already done, skipping"
    return 0
  fi
  echo "== $name: running (timeout ${tmo}s)"
  if timeout "$tmo" "$@" >"$log" 2>&1; then
    echo "CAMPAIGN-STEP-OK" >>"$log"
    echo "== $name: ok"
    CONSEC_TIMEOUTS=0
  else
    local rc=$?
    echo "CAMPAIGN-STEP-FAILED rc=$rc" >>"$log"
    echo "== $name: FAILED rc=$rc (see $log)"
    if [ "$rc" -eq 124 ]; then
      CONSEC_TIMEOUTS=$((CONSEC_TIMEOUTS + 1))
      if [ "$CONSEC_TIMEOUTS" -ge 2 ]; then
        # two timeouts in a row = the tunnel is wedged; bail so the
        # watcher re-probes and resumes instead of burning every
        # remaining step timeout (steps without OK markers re-run)
        echo "== aborting: $CONSEC_TIMEOUTS consecutive step timeouts"
        exit 1
      fi
    else
      CONSEC_TIMEOUTS=0
    fi
  fi
}

# 0. fail fast if the tunnel is down (do not clobber existing results)
if ! timeout 900 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((256,256), jnp.float32)
assert float(np.asarray((x@x).sum())) == 256**3
print('tpu ok:', jax.devices())
"; then
  echo "TPU unreachable; aborting campaign"
  exit 1
fi

# 1. banded headline x2 (also populates the baseline cache for pinning)
step bench_convdiff 2400 python -u bench.py --repeats 3
step bench_convdiff_b 2400 python -u bench.py --repeats 3

# 2. unstructured headline (SELL route; auto-G should resolve 16 now)
step bench_mesh3d 4800 python -u bench.py --matrix mesh3d --nx 1024 \
  --repeats 3 --max-restarts 120

# 3. zero-knob SELL kernels at 25M nnz, CSR rows THROUGH the chunked gate
step kernels_mesh3d_defaults 4800 python -u -m gmres_tpu.cli.bench_kernels \
  --synth mesh3d:1048576 --trials 50

# 4. W=128 A/B (the VPU densify cost is ~W-proportional; W=128/K=4 was
#    never measured on chip — the cost model prefers W=256, test it)
step ab_w128_k4 2400 env GMRES_TPU_SELL_W=128 GMRES_TPU_SELL_K=4 \
  python -u -m gmres_tpu.cli.bench_kernels --synth mesh3d:1048576 --trials 50
step ab_w128_k8 2400 env GMRES_TPU_SELL_W=128 GMRES_TPU_SELL_K=8 \
  python -u -m gmres_tpu.cli.bench_kernels --synth mesh3d:1048576 --trials 50
step ab_w256_g16 2400 env GMRES_TPU_SELL_W=256 GMRES_TPU_SELL_K=8 \
  GMRES_TPU_SELL_G=16 \
  python -u -m gmres_tpu.cli.bench_kernels --synth mesh3d:1048576 --trials 50

# 5. scattered pattern: mesh (10 nnz/row) raw vs RCM-reordered
step kernels_mesh_raw 2400 python -u -m gmres_tpu.cli.bench_kernels \
  --synth mesh:1048576 --trials 50
step kernels_mesh_rcm 3600 python -u -m gmres_tpu.cli.bench_kernels \
  --synth mesh:1048576 --reorder rcm --trials 50

# 6. distributed retention after the multi-part SELL fix (<= 1.15x target)
step bench_dist 4800 python -u scripts/bench_dist_single.py

# 7. exact-ILU trisolve vs ILU-Jacobi(3), banded@262K + unstructured@262K
step bench_ilu_exact 3600 python -u scripts/bench_ilu_exact.py

# 8. MGS: default (auto-lowsync, target <= 1.28 s) vs sequential parity
step bench_mgs_default 2400 python -u bench.py --orth mgs --repeats 3
step bench_mgs_seq 2400 python -u bench.py --orth mgs --seq-mgs --repeats 3

# 9. banded kernel rows (dot f64 should now ride the df64 fast path <= 1 ms)
step kernels_convdiff 2400 python -u -m gmres_tpu.cli.bench_kernels \
  --synth convdiff:1024 --trials 50

# 10. condest on chip (reference: plots-and-data.ipynb cell-1 table)
step condest_convdiff 3600 python -u -m gmres_tpu.cli.condest_cli \
  --synth convdiff:1024 --max-iters 20000
step condest_mesh3d 3600 python -u -m gmres_tpu.cli.condest_cli \
  --synth mesh3d:262144 --max-iters 20000

echo "campaign sweep complete; artifacts in $OUT"
grep -l "CAMPAIGN-STEP-FAILED" "$OUT"/*.txt 2>/dev/null || echo "no failures"

# 11. batched multi-RHS amortization decomposition (weak item 8)
step bench_batched_quant 2400 python -u scripts/bench_batched_quant.py
