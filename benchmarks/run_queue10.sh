#!/bin/bash
# Queue 10 (final, hard-stopped): last block-improvement evals for the
# toffoli-6 assembly; every run resumable and bounded so the chip is free
# well before round end.
cd /root/repo
LOG=/tmp/queue.log
echo "=== queue10 start $(date -u +%FT%TZ) ===" >> $LOG
echo "--- c4sqrtx final push start $(date -u +%T) ---" >> $LOG
timeout 3300 env CPFLOW_MAX_EVALS=320 python -u -m benchmarks.configs c4sqrtx_connected >> $LOG 2>&1
echo "--- c4sqrtx final push done rc=$? $(date -u +%T) ---" >> $LOG
echo "--- relphase_toff5 final push start $(date -u +%T) ---" >> $LOG
timeout 2700 env CPFLOW_MAX_EVALS=340 python -u -m benchmarks.configs relphase_toff5_connected >> $LOG 2>&1
echo "--- relphase_toff5 final push done rc=$? $(date -u +%T) ---" >> $LOG
echo "=== queue10 end $(date -u +%FT%TZ) ===" >> $LOG
