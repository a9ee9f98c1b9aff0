#!/bin/bash
# Round-4 SELL kernel A/B grid on mesh3d@1M: {windowed, x-resident} x
# G_BATCH x (W, K) — chasing the 3 Gnnz/s target (VERDICT item 7).
# Run AFTER the main campaign (serial chip use).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=".${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/round4
mkdir -p "$OUT"
run() {  # run <tag> <env...>
  local tag="$1"; shift
  local log="$OUT/ab_$tag.txt"
  if grep -q "CAMPAIGN-STEP-OK" "$log" 2>/dev/null; then
    echo "== ab_$tag: done"; return 0
  fi
  echo "== ab_$tag"
  if timeout 2400 env "$@" python -m gmres_tpu.cli.bench_kernels \
      --synth mesh3d:1048576 --json >"$log" 2>&1; then
    echo "CAMPAIGN-STEP-OK" >>"$log"
  else
    echo "CAMPAIGN-STEP-FAILED rc=$?" >>"$log"
  fi
  grep -h "spmv sell f32" "$log" | tail -1
}

run win_g4      GMRES_TPU_SELL_NO_XRES=1
run win_g8      GMRES_TPU_SELL_NO_XRES=1 GMRES_TPU_SELL_G=8
run win_g16     GMRES_TPU_SELL_NO_XRES=1 GMRES_TPU_SELL_G=16 GMRES_TPU_SELL_WIN_DEPTH=32
run xres_g16    GMRES_TPU_SELL_G=16
run xres_g8_w256 GMRES_TPU_SELL_G=8 GMRES_TPU_SELL_W=256
run xres_g8_cal GMRES_TPU_SELL_G=8 GMRES_TPU_SELL_CALIBRATION=results/round4/sell_cost.json

# recalibrate with the dispatch-free chain timer (the campaign's first
# fit folded tunnel dispatch into every sample), then re-pick via model
if ! grep -q "CAMPAIGN-STEP-OK" "$OUT/calibrate2.txt" 2>/dev/null; then
  if timeout 3600 python scripts/calibrate_sell_cost.py \
      "$OUT/sell_cost.json" >"$OUT/calibrate2.txt" 2>&1; then
    echo "CAMPAIGN-STEP-OK" >>"$OUT/calibrate2.txt"
  else
    echo "CAMPAIGN-STEP-FAILED rc=$?" >>"$OUT/calibrate2.txt"
  fi
fi
run xres_cal2 GMRES_TPU_SELL_CALIBRATION=results/round4/sell_cost.json
echo "A/B grid complete"
run xres_g4_w256 GMRES_TPU_SELL_W=256 GMRES_TPU_SELL_K=8
run xres_g4_w256k16 GMRES_TPU_SELL_W=256 GMRES_TPU_SELL_K=16
run xres_g2 GMRES_TPU_SELL_G=2
run xres_g1 GMRES_TPU_SELL_G=1
