#!/bin/bash
# Round-5e TPU queue: refresh the step accounting under the merged-warp
# production default (tools/step_accounting.py level-7 clone updated and
# CPU-parity-verified). Waits for round5d to release the chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/round5 docs/results
Q=logs/round5/queue5e.log
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

while ! grep -q "queue 5d done" logs/round5/queue5d.log 2>/dev/null; do sleep 60; done
log "round5d done; starting 5e"

log "step accounting (merged warp default)"
timeout 3600 python tools/step_accounting.py --iters 10 \
  > logs/round5/step_accounting.json 2> logs/round5/step_accounting.log
rc=$?
log "rc=$rc $(tail -1 logs/round5/step_accounting.log 2>/dev/null)"
if python -c "import json;json.load(open('logs/round5/step_accounting.json'))" 2>/dev/null; then
  cp logs/round5/step_accounting.json docs/results/step_accounting_r5.json
  git add docs/results/step_accounting_r5.json \
    && git commit -q -m "step accounting refresh under the merged-warp default (round 5e)" \
         -- docs/results/step_accounting_r5.json 2>>"$Q" \
    || log "commit failed for step_accounting"
fi

log "queue 5e done"
