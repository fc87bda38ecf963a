#!/bin/bash
# Round-5 TPU measurement queue (serialized on the single tunneled chip).
#
# Phase 1 -- bench evidence for the merged-warp default flip (VERDICT r4 #1)
# and the stall-proofed bench (#2): realistic mix with the new defaults,
# worst-case A/B (merged vs not), one non-md2 zoo spot check.
# Phase 2 -- per-zoo synthetic convergence at the production 640x192
# geometry (#4) + the pose_input_scale=0.5 accuracy A/B re-run (the round-4
# attempt timed out rendering the scene; the scene is now materialized so
# training starts immediately).
#
# Lesson from round 4 (ADVICE r4): every result is copied into committed
# docs/results/ the moment it lands -- logs/ is gitignored and /tmp dies
# with the machine.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/round5 docs/results
Q=logs/round5/queue.log
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

commit_result() { # path, msg
  git add "$1" && git commit -q -m "$2" -- "$1" 2>>"$Q" || log "commit failed for $1"
}

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
    commit_result "docs/results/bench_${name}_r5.json" "bench evidence: $name (round 5)"
  fi
}

synth_run() { # name, synthetic_benchmark args...
  local name=$1; shift
  log "synth $name: $*"
  local stamp=/tmp/r5_stamp_$name
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

# ---- phase 1: bench (keep the host quiet while these run) ----
bench_run mix                                      # new defaults: merged warp + stall-proof mix
bench_run worst --worst
bench_run worst_nomerged --worst --no-merged_warp  # like-for-like A/B vs r4b 53.81
bench_run cadepth --worst --zoo cadepth            # non-md2 merged-warp confirmation (r3: 40.78)

# ---- phase 2: per-zoo synthetic convergence @640x192 + ps0.5 A/B ----
SYNTH="--epochs 12 --switch-epoch 6"
synth_run md2_bias $SYNTH --disp-bias -2.2                       # ps A/B control
synth_run md2_ps05 $SYNTH --disp-bias -2.2 --pose-scale 0.5      # the lever under test
synth_run sql      $SYNTH --zoo sql                              # metric head; no disp bias
synth_run cadepth  $SYNTH --zoo cadepth --disp-bias -2.2
synth_run diffnet  $SYNTH --zoo diffnet --disp-bias -2.2
synth_run monovit  $SYNTH --zoo monovit --disp-bias -2.2
# bucketing accuracy A/B (bucket_fs changes BN batch composition; quantify)
synth_run md2_nobucket $SYNTH --disp-bias -2.2 --no-bucket

log "queue done"
