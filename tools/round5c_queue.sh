#!/bin/bash
# Round-5c TPU measurement queue: resumes what the machine reset killed.
#
# The round-5 queue died during `synth cadepth` (logs/round5/queue.log
# stops at its start line; epoch-7 checkpoint is on disk and the Trainer
# resumes it) and round5b never started (its sentinel never appeared).
# Remaining evidence, bench first (fast, verdict-critical):
#
#  1. phase-tail A/B      -- BBD_PHASE_TAIL=1 vs the 61.6 imgs/s merged-warp
#                            baseline (VERDICT r4 #6)
#  2. cadepth merged A/B  -- r5 driver run recorded 36.53 imgs/s vs 40.78 in
#                            round 3; is merged_warp hurting cadepth?
#  3. synth cadepth/diffnet/monovit + md2_nobucket (VERDICT r4 #4)
#
# Every result is copied into committed docs/results/ the moment it lands
# (ADVICE r4: logs/ is gitignored and /tmp dies with the machine).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/round5 docs/results
Q=logs/round5/queue5c.log
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

commit_result() { # path, msg
  git add "$1" && git commit -q -m "$2" -- "$1" 2>>"$Q" || log "commit failed for $1"
}

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
    commit_result "docs/results/bench_${name}_r5.json" "bench evidence: $name (round 5c)"
  fi
}

synth_run() { # name, synthetic_benchmark args...
  local name=$1; shift
  log "synth $name: $*"
  local stamp=/tmp/r5c_stamp_$name
  touch "$stamp"
  timeout 7200 python tools/synthetic_benchmark.py "$@" \
    > "logs/round5/synth_$name.log" 2>&1
  local rc=$?
  log "rc=$rc $(grep -a '^final:' "logs/round5/synth_$name.log" | tail -1)"
  local res
  res=$(find logs -name result.json -newer "$stamp" | head -1)
  if [ -n "$res" ]; then
    cp "$res" "docs/results/synth_${name}_r5.json"
    commit_result "docs/results/synth_${name}_r5.json" "synthetic convergence evidence: $name (round 5)"
  fi
}

bench_run worst_phasetail "BBD_PHASE_TAIL=1" --worst
bench_run cadepth_nomerged "" --worst --zoo cadepth --no-merged_warp

SYNTH="--epochs 12 --switch-epoch 6"
synth_run cadepth  $SYNTH --zoo cadepth --disp-bias -2.2   # resumes epoch-7 ckpt
synth_run diffnet  $SYNTH --zoo diffnet --disp-bias -2.2
synth_run monovit  $SYNTH --zoo monovit --disp-bias -2.2
synth_run md2_nobucket $SYNTH --disp-bias -2.2 --no-bucket

log "queue 5c done"
