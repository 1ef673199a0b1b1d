#!/bin/bash
# Queue 19 (round 4): VERDICT r3 punch list, TPU segment.
#  1-2  targeted re-verification of the located prospectives (item 1):
#       the 34-CZ direct toffoli-5 and 43-CX one-two-three-v1_99 trials
#       reproduced from their committed seeds and pushed through a 30k-iter
#       two-stage verification (benchmarks/reverify.py).
#  3    bench.py once: validates the new roofline fields on the real chip.
#  4    full-budget reference-notebook run (item 7).
#  5-6  toffoli-6 direct extension past the 68-CZ composite (item 2).
#  7-   beat-table extension hunts (item 8), TOTAL eval budgets resuming
#       from the committed trial summaries.
# Rules (CLAUDE.md): natural completion via CPFLOW_MAX_EVALS; timeouts are
# far-out safety nets only; ONE TPU workload at a time; `touch
# /tmp/stop_queues` drains safely before the round-end bench.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue19.log}

guard() {
  if [ -e /tmp/stop_queues ]; then
    echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG
    return 1
  fi
  return 0
}

run() { # run <safety_timeout> <target_cz> <max_evals_total> <config>
  local t=$1 tgt=$2 ev=$3 cfg=$4
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) target=$tgt evals<=$ev ---" >> $LOG
  timeout "$t" env CPFLOW_TARGET_CZ="$tgt" CPFLOW_MAX_EVALS="$ev" \
    python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}

mod() { # mod <safety_timeout> <module> [args...]
  local t=$1 m=$2; shift 2
  guard "$m $*" || return
  echo "--- $m $* start $(date -u +%T) ---" >> $LOG
  timeout "$t" python -u -m "$m" "$@" >> $LOG 2>&1
  echo "--- $m $* done rc=$? $(date -u +%T) ---" >> $LOG
}

echo "=== queue19 start $(date -u +%FT%TZ) ===" >> $LOG
# 1-2: the located prospectives (highest information value per minute)
mod 5400 benchmarks.reverify toffoli5_record_34
mod 5400 benchmarks.reverify v199_43
# 3: bench with the new roofline fields, real chip
guard bench && timeout 1800 python -u bench.py >> $LOG 2>&1
# 4: full-budget reference notebook stages
mod 14400 benchmarks.full_notebook_run
# 5-6: toffoli-6 direct extension (VMEM-safe batch 512, k 55-80)
run 9000 67 150 toffoli6_connected_xz
run 9000 67 120 toffoli6_connected_direct
# 7+: beat-table extensions (TOTAL evals resume from committed summaries)
run 7200 21 165 qx_4gt5_76_chain
run 7200 29 175 qx_alu_v2_32
run 7200 43 210 qx_one_two_three_v0_98
run 5400 16 360 qx_4gt13_92
run 5400 22 420 qx_aj_e11_165
run 7200 45 330 qx_one_two_three_v1_99
run 7200 35 640 toffoli5_connected_record
echo "=== queue19 end $(date -u +%FT%TZ) ===" >> $LOG
