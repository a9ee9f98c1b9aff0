#!/bin/bash
# Round-4 hardware measurement campaign (run on the real TPU chip).
#
# Round 3's campaign lost 7 of 22 steps to harness bugs (round-3 VERDICT
# weak item 1).  Fixed here:
#   * PYTHONPATH=. exported, so `python scripts/x.py` imports gmres_tpu
#   * steps that summarize other steps' outputs FAIL when inputs are
#     missing (findmin exits 1 on empty selection — code fix)
#   * mesh microbenchmarks get the INTENDED n=1M operators (the round-3
#     invocations passed mesh3d:1024 = 1,024 rows and measured only the
#     dispatch floor)
#   * every step tees through `tail` guards nothing; logs keep full output
set -u
cd "$(dirname "$0")/.."
# PREPEND the repo root: overwriting PYTHONPATH would drop the host's
# sitecustomize dir (/root/.axon_site) that registers the TPU tunnel
# backend — the campaign would then abort with 'axon not a known backend'
export PYTHONPATH=".${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/round4
mkdir -p "$OUT"

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
  else
    echo "CAMPAIGN-STEP-FAILED rc=$?" >>"$log"
    echo "== $name: FAILED (see $log)"
  fi
}

# 0. fail fast if the tunnel is down (do not clobber existing results)
if ! timeout 120 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((256,256), jnp.float32)
assert float(np.asarray((x@x).sum())) == 256**3
print('tpu ok:', jax.devices())
"; then
  echo "TPU unreachable; aborting campaign"
  exit 1
fi

# 1. banded headline (driver metric; identity + CGSR) + per-mode lines
step bench_convdiff 2400 python -u bench.py --repeats 3

# 2. UNSTRUCTURED headline (3rd-round ask): SELL-routed n=1M operator
step bench_mesh3d 3600 python -u bench.py --matrix mesh3d --nx 1024 \
  --repeats 3 --max-restarts 120

# 3. MGS headline after the VMEM-gate fix (target <= 1.28 s)
step bench_mgs 2400 python -u bench.py --orth mgs --repeats 3

# 3b. one-reduce ICWY MGS, single-device opt-in (fused 2-sweep path;
#     the round-2 <=1.28 s MGS-class target)
step bench_mgs_lowsync 2400 python -u bench.py --orth mgs --low-sync --repeats 3

# 4. ILU-Jacobi headline
step bench_ilujacobi 2400 python -u bench.py --prec ilu_jacobi --repeats 3

# 4b. df64 tier after the Pallas pair-kernel rewrite (target: strictly
#     between mixed and baseline; round 3 measured 58 s vs baseline 8.3 s)
step bench_df64 3600 python -u bench.py --modes baseline,mixed,df64 --repeats 3

# 4c. compressed-basis tier with per-mode JSON facts (wall AND restarts)
step bench_cb 2400 python -u bench.py --modes baseline,mixed,mixed-cb --repeats 3

# 5. kernel microbenchmarks at REAL sizes (n = rows for the synth specs:
#    convdiff:1024 is 1024^2 rows; mesh*:N take absolute row counts)
step kernels_convdiff 1800 python -m gmres_tpu.cli.bench_kernels \
  --synth convdiff:1024 --json
step kernels_mesh3d 2400 python -m gmres_tpu.cli.bench_kernels \
  --synth mesh3d:1048576 --json
step kernels_mesh 2400 python -m gmres_tpu.cli.bench_kernels \
  --synth mesh:1048576 --json

# 6. SELL cost-model recalibration on this chip
step calibrate_sell 3600 python scripts/calibrate_sell_cost.py \
  "$OUT/sell_cost.json"

# 6b. SELL pipeline-knob A/B at n=1M (G = chunks per grid step; window
#     DMA lookahead depth)
step sell_g8 2400 env GMRES_TPU_SELL_G=8 \
  python -m gmres_tpu.cli.bench_kernels --synth mesh3d:1048576 --json
step sell_g8d24 2400 env GMRES_TPU_SELL_G=8 GMRES_TPU_SELL_WIN_DEPTH=24 \
  python -m gmres_tpu.cli.bench_kernels --synth mesh3d:1048576 --json
step sell_d16 2400 env GMRES_TPU_SELL_WIN_DEPTH=16 \
  python -m gmres_tpu.cli.bench_kernels --synth mesh3d:1048576 --json

# 7. L6 sweeps (warm-up discarded) + findmin (fails on empty input now)
step sweep_identity 3600 python -m gmres_tpu.experiments.sweep \
  --device tpu --orth cgsr --prec identity --warmup 1 \
  --out-dir "$OUT" convdiff:512 30 0 1e-8 42,42
# round-3 hang diagnosed: bare `ilu_jacobi` means ONE Jacobi sweep per
# triangle, which legitimately stagnates on this operator (reference
# parity: a too-crude trisolve approximation), and the sweep's
# reference-parity default max_restarts=1e6 then grinds ~forever.  Use 3
# sweeps (the paper's ILU-Jacobi(3) family) and a bounded restart budget
# so stagnating configs record '-' rows like automated.py does.
step sweep_ilujacobi 3600 python -m gmres_tpu.experiments.sweep \
  --device tpu --orth cgsr --prec "ilu_jacobi(3)" --max-restarts 2000 \
  --warmup 1 --out-dir "$OUT" convdiff:512 30 0 1e-8 42,42
step findmin_identity 600 python -m gmres_tpu.experiments.findmin \
  --plotting-format --in-dir "$OUT" 1e-8 cgsr tpu identity convdiff512
step findmin_ilujacobi 600 python -m gmres_tpu.experiments.findmin \
  --plotting-format --in-dir "$OUT" 1e-8 cgsr tpu "ilu_jacobi(3)" convdiff512

# 8. policy per-iteration cost (orthloss after the fused S-recurrence)
step bench_policy 2400 python scripts/bench_policy.py

# 9. distributed 1-device-mesh retention: DIA + SELL + ICWY-vs-seq MGS
step bench_dist 3600 python scripts/bench_dist_single.py

# 10. multi-RHS serving throughput
step bench_batched 2400 python scripts/bench_batched.py 1024 8
step bench_batched_small 2400 python scripts/bench_batched.py 256 16

echo "campaign complete; artifacts in $OUT"
grep -L "CAMPAIGN-STEP-OK" "$OUT"/*.txt 2>/dev/null | sed 's/^/STILL FAILING: /'
