#!/bin/bash
# Round-3 hardware measurement campaign (run on the real TPU chip).
#
# The TPU tunnel was unreachable for most of round 3; this script captures
# every hardware number the round-2 VERDICT asked for, resumably: each
# step writes results/round3/<step>.* and is skipped when its output
# already exists (delete a file to re-run that step).  Steps tolerate
# individual failures and continue.
#
#   VERDICT item 1: unstructured (SELL-routed) mixed-vs-fp64 headline
#   VERDICT item 2: SELL nnz/s + cost-model recalibration
#   VERDICT item 5: warm-only sweep re-run (history medians steady-state)
#   VERDICT item 8: orthloss ms/iter after the fused S-recurrence
#   VERDICT item 9: MGS headline after multi-row batching
#   round-1 item 3: distributed 1-device-mesh wall vs single-device
set -u
cd "$(dirname "$0")/.."
OUT=results/round3
mkdir -p "$OUT"

step() {  # step <name> <timeout-s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  local log="$OUT/$name.txt"
  # skip ONLY on an explicit success marker: a run interrupted mid-step
  # (tunnel drop, reboot) leaves a partial log without it and re-runs
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

# 1. banded headline reproduction (driver metric; identity + CGSR)
step bench_convdiff 2400 python bench.py --repeats 3

# 2. UNSTRUCTURED headline (VERDICT item 1): SELL-routed operator,
#    df64-SELL outer + SELL f32 inner, n=1M / ~25 nnz/row
step bench_mesh3d 3600 python bench.py --matrix mesh3d --nx 1024 \
  --repeats 3 --max-restarts 120

# 3. MGS headline after multi-row batching (VERDICT item 9: <=1.28s goal)
step bench_mgs 2400 python bench.py --orth mgs --repeats 3

# 4. ILU-Jacobi headline (DIA-repacked factors fast path)
step bench_ilujacobi 2400 python bench.py --prec ilu_jacobi --repeats 3

# 4b. df64 tier positioning: fp64-quality inner loop as two-fp32 pairs —
#     where does it land between mixed (f32 inner) and the emulated-fp64
#     baseline?  (round-3 addition; ops/df64.py)
step bench_df64 3600 python bench.py --modes baseline,mixed,df64 --repeats 3

# 4c. compressed-basis tier (CB-GMRES, round-3 addition): bf16 Krylov
#     basis under the f32 inner loop — the basis streams are CGSR's
#     dominant HBM traffic, so this should cut ms/iter if orth-bound
step bench_cb 2400 python bench.py --modes baseline,mixed,mixed-cb --repeats 3

# 5. kernel microbenchmarks: banded + mesh classes (VERDICT item 2 numbers)
step kernels_convdiff 1800 python -m gmres_tpu.cli.bench_kernels \
  --synth convdiff:1024 --json
step kernels_mesh3d 1800 python -m gmres_tpu.cli.bench_kernels \
  --synth mesh3d:1024 --json
step kernels_mesh 1800 python -m gmres_tpu.cli.bench_kernels \
  --synth mesh:1024 --json

# 6. SELL cost-model recalibration (VERDICT item 2 'done' criterion:
#    constants refit from a committed probe run on this chip)
step calibrate_sell 3600 python scripts/calibrate_sell_cost.py \
  "$OUT/sell_cost.json"

# 6b. SELL pipeline-knob A/B (VERDICT item 2: push toward 3 Gnnz/s) —
#     chunks per grid step (G) and window-DMA lookahead depth
step sell_g8 1800 env GMRES_TPU_SELL_G=8 \
  python -m gmres_tpu.cli.bench_kernels --synth mesh3d:1024 --json
step sell_g8d24 1800 env GMRES_TPU_SELL_G=8 GMRES_TPU_SELL_WIN_DEPTH=24 \
  python -m gmres_tpu.cli.bench_kernels --synth mesh3d:1024 --json
step sell_d16 1800 env GMRES_TPU_SELL_WIN_DEPTH=16 \
  python -m gmres_tpu.cli.bench_kernels --synth mesh3d:1024 --json

# 7. warm-only L6 sweep re-run (VERDICT item 5: per-config warm-up discard,
#    medians no longer pay jit compile; same configs as results/round2)
step sweep_identity 3600 python -m gmres_tpu.experiments.sweep \
  --device tpu --orth cgsr --prec identity --warmup 1 \
  --out-dir "$OUT" convdiff:512 30 0 1e-8 42,42
step sweep_ilujacobi 3600 python -m gmres_tpu.experiments.sweep \
  --device tpu --orth cgsr --prec ilu_jacobi --warmup 1 \
  --out-dir "$OUT" convdiff:512 30 0 1e-8 42,42
step findmin_identity 600 python -m gmres_tpu.experiments.findmin \
  --plotting-format --in-dir "$OUT" 1e-8 cgsr tpu identity convdiff512
step findmin_ilujacobi 600 python -m gmres_tpu.experiments.findmin \
  --plotting-format --in-dir "$OUT" 1e-8 cgsr tpu ilu_jacobi convdiff512

# 8. policy per-iteration cost (VERDICT item 8: orthloss <=1.5 ms/iter
#    after the fused Pallas S-recurrence)
step bench_policy 2400 python scripts/bench_policy.py

# 9. distributed 1-device-mesh wall vs single device (fast-path retention)
step bench_dist 2400 python scripts/bench_dist_single.py

# 10. multi-RHS serving throughput (solve_batched; round-3 addition,
#     solver/batched.py).  Large problem: only the operator reads are
#     shared across lanes (the per-lane basis streams are not), so the
#     headline serving win is the SMALL-problem case where per-iteration
#     dispatch dominates and lanes amortize it.
step bench_batched 2400 python scripts/bench_batched.py 1024 8
step bench_batched_small 2400 python scripts/bench_batched.py 256 16

echo "campaign complete; artifacts in $OUT"
