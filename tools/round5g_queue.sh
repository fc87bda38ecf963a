#!/bin/bash
# Round-5g TPU queue: runs AFTER round-5f finishes (waits on /tmp/q5f.pid).
#   1. retry the stall-proofed step-accounting run (5f attempt died on a
#      transient tunnel InvalidArgument at the first PRNGKey)
# Results copied into docs/results/ and committed the moment they land.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/round5 docs/results
Q=logs/round5/queue5g.log
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

# wait for the 5f queue to release the TPU
if [ -f /tmp/q5f.pid ]; then
  log "waiting for q5f ($(cat /tmp/q5f.pid))"
  while kill -0 "$(cat /tmp/q5f.pid)" 2>/dev/null; do sleep 60; done
fi
log "q5f done; starting step accounting retry"

for attempt in 1 2; do
  timeout 5400 python tools/step_accounting.py --iters 10 --blocks 3 \
    > logs/round5/step_accounting_5g.json 2> logs/round5/step_accounting_5g.log
  rc=$?
  log "attempt $attempt rc=$rc $(tail -1 logs/round5/step_accounting_5g.log 2>/dev/null)"
  if python -c "import json;json.load(open('logs/round5/step_accounting_5g.json'))" 2>/dev/null; then
    cp logs/round5/step_accounting_5g.json docs/results/step_accounting_r5.json
    git add docs/results/step_accounting_r5.json \
      && git commit -q -m "step accounting: stall-proofed re-run under the round-5 defaults" \
           -- docs/results/step_accounting_r5.json 2>>"$Q" \
      || log "commit failed for step_accounting"
    break
  fi
  sleep 120   # transient tunnel errors: back off then retry once
done

log "queue 5g done"
