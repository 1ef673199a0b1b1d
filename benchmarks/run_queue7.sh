#!/bin/bash
# Queue 7: extend toffoli4_star to the published 16 (60-eval cap stopped at
# 17; the earlier run this round needed 97 evals), then success-ratio rerun
# on the 16-CZ architecture.
cd /root/repo
LOG=/tmp/queue.log
if [ -f /tmp/queue6.pid ]; then
  while kill -0 "$(cat /tmp/queue6.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== queue7 start $(date -u +%FT%TZ) ===" >> $LOG
echo "--- toffoli4_star extension start $(date -u +%T) ---" >> $LOG
timeout 5400 env CPFLOW_MAX_EVALS=180 python -u -m benchmarks.configs toffoli4_star >> $LOG 2>&1
echo "--- toffoli4_star extension done rc=$? $(date -u +%T) ---" >> $LOG
echo "--- success_ratio rerun start $(date -u +%T) ---" >> $LOG
timeout 7200 python -u -m benchmarks.success_ratio 512 5000 >> $LOG 2>&1
echo "--- success_ratio rerun done rc=$? $(date -u +%T) ---" >> $LOG
echo "=== queue7 end $(date -u +%FT%TZ) ===" >> $LOG
