#!/bin/bash
# Round-5b TPU measurement queue. Waits for tools/round5_queue.sh to finish
# (single tunneled chip -- never run two TPU jobs at once), then measures:
#
#  1. phase-tail A/B  -- BBD_PHASE_TAIL=1 vs the 61.6 imgs/s merged-warp
#     baseline (VERDICT r4 #6; exactness proven in tests/test_phase_tail.py)
#  2. cadepth merged-warp A/B -- the r5 driver run recorded 36.53 imgs/s
#     (328.5 ms) vs 40.78 in round 3; determine whether merged_warp hurts
#     cadepth (its bigger decoder changes the warp/compute ratio) or the
#     session was slow.
#
# Every JSON line is copied into committed docs/results/ the moment it
# lands (ADVICE r4: logs/ is gitignored and /tmp dies with the machine).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/round5 docs/results
Q=logs/round5/queue5b.log
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

# wait for the phase-1/2 queue to release the chip (it logs this sentinel
# as its last line; polling the log avoids process-pattern matching)
while ! grep -q "queue done" logs/round5/queue.log 2>/dev/null; do sleep 60; done
log "round5_queue.sh done; starting 5b"

bench_run() { # name, env k=v or "", bench.py args...
  local name=$1 envkv=$2; shift 2
  log "bench $name: env='$envkv' $*"
  if [ -n "$envkv" ]; then
    timeout 3600 env $envkv python bench.py "$@" > "logs/round5/bench_$name.log" 2>&1
  else
    timeout 3600 python bench.py "$@" > "logs/round5/bench_$name.log" 2>&1
  fi
  local rc=$?
  local line
  line=$(grep -h '^{' "logs/round5/bench_$name.log" | tail -1)
  log "rc=$rc $line"
  if [ -n "$line" ]; then
    echo "$line" > "docs/results/bench_${name}_r5.json"
    git add "docs/results/bench_${name}_r5.json" \
      && git commit -q -m "bench evidence: $name (round 5b)" \
           -- "docs/results/bench_${name}_r5.json" 2>>"$Q" \
      || log "commit failed for $name"
  fi
}

bench_run worst_phasetail "BBD_PHASE_TAIL=1" --worst
bench_run cadepth_nomerged "" --worst --zoo cadepth --no-merged_warp

log "queue 5b done"
