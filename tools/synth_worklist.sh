#!/bin/bash
# Round-4 accuracy-evidence queue (VERDICT r3 #5): synthetic two-stage
# benchmark at PRODUCTION 640x192 through the real Trainer, per zoo and
# per perf-mode, sequentially (one TPU chip). Results are copied into
# docs/results/ (logs/ is gitignored) so the evidence survives the round.
# Usage: bash tools/synth_worklist.sh [logdir]
set -u
LOG=${1:-/tmp/synth_worklist}
mkdir -p "$LOG" docs/results

run() {
  name=$1; shift
  echo "$(date -u +%H:%M:%S) synthetic_benchmark $name: $*" | tee -a "$LOG/queue.log"
  timeout 7200 python tools/synthetic_benchmark.py "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  # the tool prints "wrote logs/<run>/result.json" on success
  res=$(grep -o "wrote .*result.json" "$LOG/$name.log" | awk '{print $2}')
  if [ -n "${res:-}" ] && [ -f "$res" ]; then
    cp "$res" "docs/results/synth_$name.json"
  fi
  echo "rc=$rc $(tail -1 "$LOG/$name.log")" | tee -a "$LOG/queue.log"
}

# md2 at production geometry: default (bucketed) + the two quantification
# A/Bs VERDICT asked for (bucket off, pose_input_scale 0.5)
run md2_bias            --disp-bias -2.2
run md2_bias_nobucket   --disp-bias -2.2 --no-bucket
run md2_bias_ps0.5      --disp-bias -2.2 --pose-scale 0.5
# per-zoo convergence evidence at production geometry
run cadepth_bias        --zoo cadepth --disp-bias -2.2
run diffnet_bias        --zoo diffnet --disp-bias -2.2
run monovit_bias        --zoo monovit --disp-bias -2.2
run sql_bias            --zoo sql --disp-bias -2.2
# true-default cold start (no bias): plateau behavior at production res
run md2_default         --epochs 12

echo "$(date -u +%H:%M:%S) all done" | tee -a "$LOG/queue.log"
