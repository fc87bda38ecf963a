#!/bin/bash
# Round-4 TPU queue, part 2: wait for the in-flight md2_bias synthetic run,
# then (1) merged-warp A/B + new default-mode bench validation, (2) the
# trimmed accuracy-evidence queue (VERDICT r3 #5) -- md2 A/Bs at full
# length, per-zoo convergence at 8 epochs (artifact, not a full benchmark),
# the 12-epoch no-bias cold start dropped to keep TPU time for perf work.
# Usage: bash tools/round4_queue.sh [logdir] [wait_pid]
set -u
LOG=${1:-/tmp/round4_queue}
WAIT_PID=${2:-}
mkdir -p "$LOG" docs/results

log() { echo "$(date -u +%H:%M:%S) $*" | tee -a "$LOG/queue.log"; }

if [ -n "$WAIT_PID" ]; then
  log "waiting for pid $WAIT_PID (md2_bias synthetic run)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  log "pid $WAIT_PID exited"
fi
# collect the orphaned md2_bias result (its parent script was replaced)
if [ -f logs/synth_bench_bfloat16_bias-2.2/result.json ]; then
  cp logs/synth_bench_bfloat16_bias-2.2/result.json docs/results/synth_md2_bias.json
  log "collected synth_md2_bias.json"
fi

probe() {
  timeout 180 python -c "import jax, jax.numpy as jnp; float(jnp.sum(jnp.ones((8,128))))" >/dev/null 2>&1
}
for i in $(seq 1 200); do
  probe && { log "tunnel up after $i probes"; break; }
  [ "$i" = 200 ] && { log "giving up on tunnel"; exit 1; }
  sleep 90
done

log "bench --worst --merged_warp (A/B vs 54.23)"
timeout 2400 python bench.py --worst --merged_warp >"$LOG/bench_merged.log" 2>&1
log "rc=$? $(tail -1 "$LOG/bench_merged.log")"

log "bench (new default mix mode validation)"
timeout 3600 python bench.py >"$LOG/bench_default.log" 2>&1
log "rc=$? $(tail -1 "$LOG/bench_default.log")"

run() {
  name=$1; shift
  log "synthetic_benchmark $name: $*"
  timeout 7200 python tools/synthetic_benchmark.py "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  res=$(grep -o "wrote .*result.json" "$LOG/$name.log" | awk '{print $2}')
  if [ -n "${res:-}" ] && [ -f "$res" ]; then
    cp "$res" "docs/results/synth_$name.json"
  fi
  log "rc=$rc $(tail -1 "$LOG/$name.log")"
}

run md2_bias_nobucket   --disp-bias -2.2 --no-bucket
run md2_bias_ps0.5      --disp-bias -2.2 --pose-scale 0.5
run cadepth_bias        --zoo cadepth --disp-bias -2.2 --epochs 8 --switch-epoch 4
run diffnet_bias        --zoo diffnet --disp-bias -2.2 --epochs 8 --switch-epoch 4
run monovit_bias        --zoo monovit --disp-bias -2.2 --epochs 8 --switch-epoch 4
run sql_bias            --zoo sql --disp-bias -2.2 --epochs 8 --switch-epoch 4

log "all done"
