#!/bin/bash
# Queue 13: extended-budget resumes of the open beat hunts (round 3 cont.).
# Priority: toffoli-6 composite blocks (relphase_toff5 sub-14 saves 2 CZ
# each in the composite; c4sqrtx sub-36 saves 1:1), then new/extended
# ibm_qx beats, then the direct toffoli-5 record.  One workload at a time
# (axon tunnel constraint); every segment is resumable and early-stops at
# its CPFLOW_TARGET_CZ.
cd /root/repo
LOG=/tmp/queue.log
run() { # run <timeout> <target_cz> <max_evals> <config>
  local t=$1 tgt=$2 ev=$3 cfg=$4
  echo "--- $cfg start $(date -u +%T) target=$tgt evals<=$ev ---" >> $LOG
  timeout "$t" env CPFLOW_TARGET_CZ="$tgt" CPFLOW_MAX_EVALS="$ev" \
    python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue13 start $(date -u +%FT%TZ) ===" >> $LOG
run 2400 13 420 relphase_toff5_connected
run 2400 35 420 c4sqrtx_connected
run 1800 16 240 qx_4gt13_92
run 1800 43 150 qx_one_two_three_v0_98
run 1800 22 220 qx_aj_e11_165
run 1500 26 120 qx_4mod5_v1_24_chain
run 1500 26 160 qx_one_two_three_v2_100
run 1500 24 120 qx_alu_v0_26_chain
run 1500 23 140 qx_4gt13_91_chain
run 2400 35 580 toffoli5_connected_record
echo "=== queue13 end $(date -u +%FT%TZ) ===" >> $LOG
