#!/bin/bash
# Queue 12 (last): re-land the three artifact-less beats, hard-capped.
cd /root/repo
LOG=/tmp/queue.log
echo "=== queue12 start $(date -u +%FT%TZ) ===" >> $LOG
echo "--- aj_e11_165 start $(date -u +%T) ---" >> $LOG
timeout 1500 python -u -m benchmarks.configs qx_aj_e11_165 >> $LOG 2>&1
echo "--- aj_e11_165 done rc=$? $(date -u +%T) ---" >> $LOG
echo "--- 4gt13_91_chain resume start $(date -u +%T) ---" >> $LOG
timeout 1100 env CPFLOW_MAX_EVALS=120 python -u -m benchmarks.configs qx_4gt13_91_chain >> $LOG 2>&1
echo "--- 4gt13_91_chain resume done rc=$? $(date -u +%T) ---" >> $LOG
echo "--- alu_v4_36 resume start $(date -u +%T) ---" >> $LOG
timeout 1100 env CPFLOW_MAX_EVALS=120 python -u -m benchmarks.configs qx_alu_v4_36 >> $LOG 2>&1
echo "--- alu_v4_36 resume done rc=$? $(date -u +%T) ---" >> $LOG
echo "=== queue12 end $(date -u +%FT%TZ) ===" >> $LOG
