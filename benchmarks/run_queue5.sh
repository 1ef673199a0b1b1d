#!/bin/bash
# Queue 5 (extensions): v2_100 full budget, then the sub-36 toffoli-5
# record hunt. Waits for queue4.
cd /root/repo
LOG=/tmp/queue.log
if [ -f /tmp/queue4.pid ]; then
  while kill -0 "$(cat /tmp/queue4.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== queue5 start $(date -u +%FT%TZ) ===" >> $LOG
echo "--- v2_100 extension start $(date -u +%T) ---" >> $LOG
timeout 7200 env CPFLOW_MAX_EVALS=160 python -u -m benchmarks.configs qx_one_two_three_v2_100 >> $LOG 2>&1
echo "--- v2_100 extension done rc=$? $(date -u +%T) ---" >> $LOG
echo "--- toffoli5_record start $(date -u +%T) ---" >> $LOG
timeout 10000 python -u -m benchmarks.configs toffoli5_connected_record >> $LOG 2>&1
echo "--- toffoli5_record done rc=$? $(date -u +%T) ---" >> $LOG
echo "=== queue5 end $(date -u +%FT%TZ) ===" >> $LOG
