#!/bin/bash
# Round-5d TPU measurement queue. Waits for round5b (phase-tail + cadepth
# A/Bs) to release the chip, then:
#
#  1. per-zoo worst-case benches with the round-5 merged-warp default
#     (the README per-zoo table still quotes round-3 pre-merged numbers)
#  2. tools/smooth_probe.py -- standalone cost of the 24.2 ms in-step
#     smoothness line across layout variants
#
# Every result is committed into docs/results/ the moment it lands.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/round5 docs/results
Q=logs/round5/queue5d.log
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

while ! grep -q "queue 5b done" logs/round5/queue5b.log 2>/dev/null; do sleep 60; done
log "round5b done; starting 5d"

bench_run() { # name, bench.py args...
  local name=$1; shift
  log "bench $name: $*"
  timeout 3600 python bench.py "$@" > "logs/round5/bench_$name.log" 2>&1
  local rc=$?
  local line
  line=$(grep -h '^{' "logs/round5/bench_$name.log" | tail -1)
  log "rc=$rc $line"
  if [ -n "$line" ]; then
    echo "$line" > "docs/results/bench_${name}_r5.json"
    git add "docs/results/bench_${name}_r5.json" \
      && git commit -q -m "bench evidence: $name (round 5d)" \
           -- "docs/results/bench_${name}_r5.json" 2>>"$Q" \
      || log "commit failed for $name"
  fi
}

bench_run sql --worst --zoo sql
bench_run diffnet --worst --zoo diffnet
bench_run monovit --worst --zoo monovit

log "smooth probe"
timeout 1800 python tools/smooth_probe.py > logs/round5/smooth_probe.log 2>&1
log "rc=$? $(tail -1 logs/round5/smooth_probe.log)"
cp logs/round5/smooth_probe.log docs/results/smooth_probe_r5.txt
git add docs/results/smooth_probe_r5.txt \
  && git commit -q -m "probe evidence: standalone smoothness-term cost (round 5d)" \
       -- docs/results/smooth_probe_r5.txt 2>>"$Q" \
  || log "commit failed for smooth_probe"

log "queue 5d done"
