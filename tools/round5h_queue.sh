#!/bin/bash
# Round-5h TPU queue: the one measurement left open at the 5g snapshot —
# the packed-sweep per-row hit-skip (BBD_WARP_ROW_SKIP, ops/warp_pallas.py:62,
# exactness already covered in interpret mode). Same-session A/B at the
# production default config (worst-case F=7): control first, then skip=1.
# Every result is copied into docs/results/ and committed the moment it
# lands (advisor r4: gitignored logs/ do not survive machine resets).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/round5 docs/results
Q=logs/round5/queue5h.log
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
    echo "$line" > "docs/results/bench_${name}_r5h.json"
    git add "docs/results/bench_${name}_r5h.json" \
      && git commit -q -m "bench evidence: $name (round 5h)" \
           -- "docs/results/bench_${name}_r5h.json" 2>>"$Q" \
      || log "commit failed for $name"
  fi
}

bench_job worst_control --worst --F 7
BBD_WARP_ROW_SKIP=1 bench_job worst_rowskip --worst --F 7

log "queue 5h done"
