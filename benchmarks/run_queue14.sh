#!/bin/bash
# Queue 14: re-run the hunts whose queue-13 slots were lost to the tunnel
# outage. Lesson from queue 13 (RESULTS_r3 §18 follow-up): a hard
# `timeout` that fires mid-TPU-dispatch can crash the tunnel worker and
# take the backend down for hours. Budget by EVAL COUNT (natural
# completion) and keep the timeout as a far-out safety net only.
cd /root/repo
LOG=/tmp/queue.log
run() { # run <safety_timeout> <target_cz> <max_evals> <config>
  local t=$1 tgt=$2 ev=$3 cfg=$4
  echo "--- $cfg start $(date -u +%T) target=$tgt evals<=$ev ---" >> $LOG
  timeout "$t" env CPFLOW_TARGET_CZ="$tgt" CPFLOW_MAX_EVALS="$ev" \
    python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue14 start $(date -u +%FT%TZ) ===" >> $LOG
# short segments: ~40-60 extra evals each (roughly 15-30 min at 2048)
run 5400 16 220 qx_4gt13_92
run 5400 43 130 qx_one_two_three_v0_98
run 5400 22 200 qx_aj_e11_165
run 5400 26 100 qx_4mod5_v1_24_chain
run 5400 26 140 qx_one_two_three_v2_100
run 5400 24 100 qx_alu_v0_26_chain
run 5400 23 120 qx_4gt13_91_chain
run 9999 35 540 toffoli5_connected_record
run 9999 35 460 c4sqrtx_connected
echo "=== queue14 end $(date -u +%FT%TZ) ===" >> $LOG
