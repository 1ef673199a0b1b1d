#!/bin/bash
# Follow-on TPU queue: chain composite blocks (the 48-CZ chain toffoli-5
# construction needs them re-synthesized) after the main queue finishes.
cd /root/repo
LOG=/tmp/queue.log
if [ -f /tmp/queue.pid ]; then
  while kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== queue3 start $(date -u +%FT%TZ) ===" >> $LOG
for spec in "4000 relphase_toff4_chain" "6000 c3sqrtx_chain"; do
  set -- $spec
  echo "--- $2 start $(date -u +%T) ---" >> $LOG
  timeout "$1" env CPFLOW_MAX_EVALS=150 python -u -m benchmarks.configs "$2" >> $LOG 2>&1
  echo "--- $2 done rc=$? $(date -u +%T) ---" >> $LOG
done
echo "--- composite start $(date -u +%T) ---" >> $LOG
timeout 900 python -u -m benchmarks.composite >> $LOG 2>&1
echo "--- composite done rc=$? $(date -u +%T) ---" >> $LOG
echo "=== queue3 end $(date -u +%FT%TZ) ===" >> $LOG
# appended: xz-template toffoli-5 hunt
echo "--- toffoli5_connected_xz start $(date -u +%T) ---" >> $LOG
timeout 4000 python -u -m benchmarks.configs toffoli5_connected_xz >> $LOG 2>&1
echo "--- toffoli5_connected_xz done rc=$? $(date -u +%T) ---" >> $LOG
