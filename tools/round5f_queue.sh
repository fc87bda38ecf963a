#!/bin/bash
# Round-5f TPU queue: measurements behind the per-zoo perf-default ship
# (config.py resolved_merged_warp/resolved_phase_tail):
#   1. step accounting re-run, stall-proofed (min-of-blocks per level; the
#      5e single-block run recorded a -24.6 ms smoothness delta from a
#      level-6 stall) + phase-tail production default
#   2. phase-tail A/Bs for diffnet/monovit (default-off pending these)
#   3. default mix refresh (md2 now runs the phase tail)
#   4. cadepth default re-measure (auto now resolves to the two-call warp)
# Every result is copied into docs/results/ and committed the moment it
# lands (advisor r4: gitignored logs/ do not survive machine resets).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/round5 docs/results
Q=logs/round5/queue5f.log
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

bench_job() { # name, args...
  local name=$1; shift
  log "bench $name: $*"
  timeout 3600 python bench.py "$@" > "logs/round5/bench_$name.log" 2>&1
  local rc=$?
  local line
  line=$(grep -a '^{' "logs/round5/bench_$name.log" | tail -1)
  log "rc=$rc $line"
  if [ -n "$line" ] && echo "$line" | python -c "import json,sys;json.loads(sys.stdin.read())" 2>/dev/null; then
    echo "$line" > "docs/results/bench_${name}_r5f.json"
    git add "docs/results/bench_${name}_r5f.json" \
      && git commit -q -m "bench evidence: $name (round 5f)" \
           -- "docs/results/bench_${name}_r5f.json" 2>>"$Q" \
      || log "commit failed for $name"
  fi
}

log "step accounting (stall-proofed, phase-tail default)"
timeout 5400 python tools/step_accounting.py --iters 10 --blocks 3 \
  > logs/round5/step_accounting_5f.json 2> logs/round5/step_accounting_5f.log
rc=$?
log "rc=$rc $(tail -1 logs/round5/step_accounting_5f.log 2>/dev/null)"
if python -c "import json;json.load(open('logs/round5/step_accounting_5f.json'))" 2>/dev/null; then
  cp logs/round5/step_accounting_5f.json docs/results/step_accounting_r5.json
  git add docs/results/step_accounting_r5.json \
    && git commit -q -m "step accounting: stall-proofed re-run under the round-5 defaults" \
         -- docs/results/step_accounting_r5.json 2>>"$Q" \
    || log "commit failed for step_accounting"
fi

bench_job diffnet_phasetail --worst --zoo diffnet --phase_tail
bench_job monovit_phasetail --worst --zoo monovit --phase_tail
bench_job mix_defaults --mix
bench_job cadepth_auto --worst --zoo cadepth

log "queue 5f done"
