#!/bin/bash
# Wait for the axon tunnel to answer, then run the queued TPU measurements
# sequentially. Each probe is a killable subprocess (the tunneled backend
# HANGS rather than errors when the relay is down -- CLAUDE.md).
# Usage: bash tools/tpu_worklist.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_worklist}
mkdir -p "$LOG"

probe() {
  timeout 180 python -c "import jax, jax.numpy as jnp; float(jnp.sum(jnp.ones((8,128))))" >/dev/null 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for tunnel..." | tee -a "$LOG/worklist.log"
for i in $(seq 1 200); do
  if probe; then
    echo "$(date -u +%H:%M:%S) tunnel up after $i probes" | tee -a "$LOG/worklist.log"
    break
  fi
  if [ "$i" = 200 ]; then
    echo "$(date -u +%H:%M:%S) giving up" | tee -a "$LOG/worklist.log"
    exit 1
  fi
  sleep 90
done

echo "$(date -u +%H:%M:%S) bench --mix" | tee -a "$LOG/worklist.log"
timeout 2400 python bench.py --mix >"$LOG/bench_mix.log" 2>&1
echo "rc=$? $(tail -1 "$LOG/bench_mix.log")" | tee -a "$LOG/worklist.log"

echo "$(date -u +%H:%M:%S) step accounting" | tee -a "$LOG/worklist.log"
timeout 3600 python tools/step_accounting.py >"$LOG/step_accounting.log" 2>&1
echo "rc=$?" | tee -a "$LOG/worklist.log"

for mode in pose depth both; do
  echo "$(date -u +%H:%M:%S) bench --remat $mode" | tee -a "$LOG/worklist.log"
  timeout 2400 python bench.py --worst --remat "$mode" >"$LOG/bench_remat_$mode.log" 2>&1
  echo "rc=$? $(tail -1 "$LOG/bench_remat_$mode.log")" | tee -a "$LOG/worklist.log"
done

echo "$(date -u +%H:%M:%S) done" | tee -a "$LOG/worklist.log"
