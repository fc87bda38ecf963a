#!/bin/bash
# Round-5i TPU queue: runs AFTER round-5h (waits on /tmp/q5h.pid).
#   1. pose per-stage batch-scaling probe (tools/pose_stage_probe.py,
#      built last session, never TPU-run) — localizes the ~49 ms
#      batch-independent pose floor found by pose_batch_probe.
# Results copied into docs/results/ and committed the moment they land.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/round5 docs/results
Q=logs/round5/queue5i.log
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

if [ -f /tmp/q5h.pid ]; then
  log "waiting for q5h ($(cat /tmp/q5h.pid))"
  while kill -0 "$(cat /tmp/q5h.pid)" 2>/dev/null; do sleep 60; done
fi
log "q5h done; starting pose stage probe"

timeout 5400 python tools/pose_stage_probe.py --iters 20 \
  > logs/round5/pose_stage_probe.txt 2>&1
rc=$?
log "rc=$rc"
if [ $rc -eq 0 ] && grep -q "ms/img" logs/round5/pose_stage_probe.txt; then
  cp logs/round5/pose_stage_probe.txt docs/results/pose_stage_probe_r5.txt
  git add docs/results/pose_stage_probe_r5.txt \
    && git commit -q -m "probe evidence: pose per-stage batch scaling (round 5i)" \
         -- docs/results/pose_stage_probe_r5.txt 2>>"$Q" \
    || log "commit failed for pose_stage_probe"
fi

log "queue 5i done"
