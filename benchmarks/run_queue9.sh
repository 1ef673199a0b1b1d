#!/bin/bash
# Queue 9: improve the toffoli-6 blocks (extend both hunts), rebuild the
# composite, re-export artifacts.
cd /root/repo
LOG=/tmp/queue.log
if [ -f /tmp/queue8.pid ]; then
  while kill -0 "$(cat /tmp/queue8.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== queue9 start $(date -u +%FT%TZ) ===" >> $LOG
echo "--- relphase_toff5 extension start $(date -u +%T) ---" >> $LOG
timeout 5400 env CPFLOW_MAX_EVALS=220 python -u -m benchmarks.configs relphase_toff5_connected >> $LOG 2>&1
echo "--- relphase_toff5 extension done rc=$? $(date -u +%T) ---" >> $LOG
echo "--- c4sqrtx extension start $(date -u +%T) ---" >> $LOG
timeout 5400 env CPFLOW_MAX_EVALS=200 python -u -m benchmarks.configs c4sqrtx_connected >> $LOG 2>&1
echo "--- c4sqrtx extension done rc=$? $(date -u +%T) ---" >> $LOG
echo "=== queue9 end $(date -u +%FT%TZ) ===" >> $LOG
