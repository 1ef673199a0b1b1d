#!/bin/bash
# Queue 8 (stretch): toffoli-6 composite blocks + sub-14 toffoli-4 hunt.
cd /root/repo
LOG=/tmp/queue.log
if [ -f /tmp/queue7.pid ]; then
  while kill -0 "$(cat /tmp/queue7.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== queue8 start $(date -u +%FT%TZ) ===" >> $LOG
for cfg in relphase_toff5_connected c4sqrtx_connected; do
  echo "--- $cfg start $(date -u +%T) ---" >> $LOG
  timeout 6000 python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
done
echo "--- composite (toffoli6) start $(date -u +%T) ---" >> $LOG
timeout 1800 python -u -m benchmarks.composite >> $LOG 2>&1
echo "--- composite done rc=$? $(date -u +%T) ---" >> $LOG
echo "--- toffoli4_connected_record start $(date -u +%T) ---" >> $LOG
timeout 6000 python -u -m benchmarks.configs toffoli4_connected_record >> $LOG 2>&1
echo "--- toffoli4_connected_record done rc=$? $(date -u +%T) ---" >> $LOG
echo "=== queue8 end $(date -u +%FT%TZ) ===" >> $LOG
