#!/bin/bash
# Queue 19e: reprioritized tail of queue 19c. The notebook resume
# (VERDICT r3 item 7, cells 26-33 — cells 6-18 already recorded) runs
# FIRST so the full-budget record lands this round, then the remaining
# beat-table segments, then the toffoli-6 hunts rerun WITH the graded
# fallback score (RESULTS_r4 section 11) so the posterior finally gets
# signal. Launched by run_queue19e_waiter.sh after 19c drains.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue19.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
run() {
  local t=$1 tgt=$2 ev=$3 cfg=$4
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) target=$tgt evals<=$ev ---" >> $LOG
  timeout "$t" env CPFLOW_TARGET_CZ="$tgt" CPFLOW_MAX_EVALS="$ev" \
    python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue19e start $(date -u +%FT%TZ) ===" >> $LOG
guard notebook_resume && {
  echo "--- notebook resume start $(date -u +%T) ---" >> $LOG
  timeout 7200 env CPFLOW_NB_RESUME=1 \
    python -u -m benchmarks.full_notebook_run >> $LOG 2>&1
  echo "--- notebook resume done rc=$? $(date -u +%T) ---" >> $LOG
}
run 7200 29 175 qx_alu_v2_32
run 7200 43 210 qx_one_two_three_v0_98
run 5400 16 360 qx_4gt13_92
run 5400 22 420 qx_aj_e11_165
run 7200 45 330 qx_one_two_three_v1_99
run 7200 35 640 toffoli5_connected_record
run 9000 67 300 toffoli6_connected_xz
run 9000 67 240 toffoli6_connected_direct
echo "=== queue19e end $(date -u +%FT%TZ) ===" >> $LOG
