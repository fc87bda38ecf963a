#!/bin/bash
# Round-4 TPU queue, part 3 (fresh machine: /tmp + logs/ + .jax_cache were
# wiped between sessions, so part 2's synthetic-run results were lost before
# they could be committed). Lesson applied: copy every result into
# docs/results/ (committed) the moment it lands.
#   1. merged-warp A/B vs a same-session --worst baseline
#   2. md2 accuracy evidence at production 640x192 (VERDICT r3 #5):
#      bias-2.2 run + pose_input_scale=0.5 + no-bucket A/Bs
#   3. per-zoo 8-epoch convergence artifacts (cadepth/diffnet/monovit/sql)
# Usage: bash tools/round4b_queue.sh [logdir]
set -u
LOG=${1:-logs/round4b}
mkdir -p "$LOG" docs/results

log() { echo "$(date -u +%H:%M:%S) $*" | tee -a "$LOG/queue.log"; }

log "bench --worst (fresh-session like-for-like baseline)"
timeout 2400 python bench.py --worst >"$LOG/bench_worst.log" 2>&1
log "rc=$? $(tail -1 "$LOG/bench_worst.log")"

log "bench --worst --merged_warp (A/B)"
timeout 2400 python bench.py --worst --merged_warp >"$LOG/bench_merged.log" 2>&1
log "rc=$? $(tail -1 "$LOG/bench_merged.log")"

run() {
  name=$1; shift
  log "synthetic_benchmark $name: $*"
  timeout 5400 python tools/synthetic_benchmark.py "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  res=$(grep -o "wrote .*result.json" "$LOG/$name.log" | awk '{print $2}')
  if [ -n "${res:-}" ] && [ -f "$res" ]; then
    cp "$res" "docs/results/synth_$name.json"
  fi
  log "rc=$rc $(tail -1 "$LOG/$name.log")"
}

run md2_bias            --disp-bias -2.2
run md2_bias_ps0.5      --disp-bias -2.2 --pose-scale 0.5
run md2_bias_nobucket   --disp-bias -2.2 --no-bucket
run cadepth_bias        --zoo cadepth --disp-bias -2.2 --epochs 8 --switch-epoch 4
run diffnet_bias        --zoo diffnet --disp-bias -2.2 --epochs 8 --switch-epoch 4
run monovit_bias        --zoo monovit --disp-bias -2.2 --epochs 8 --switch-epoch 4
run sql_bias            --zoo sql --disp-bias -2.2 --epochs 8 --switch-epoch 4

log "all done"
