#!/bin/bash
# Queue 4: toffoli-4 re-synthesis (architectures for the success-ratio
# experiment + Table 2 re-confirmation), then the corrected success ratios.
cd /root/repo
LOG=/tmp/queue.log
if [ -f /tmp/queue3.pid ]; then
  while kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== queue4 start $(date -u +%FT%TZ) ===" >> $LOG
for cfg in toffoli4_connected toffoli4_star toffoli4_kite toffoli4_square toffoli4_chain; do
  echo "--- $cfg start $(date -u +%T) ---" >> $LOG
  timeout 4000 python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
done
echo "--- success_ratio start $(date -u +%T) ---" >> $LOG
timeout 7200 python -u -m benchmarks.success_ratio 512 5000 >> $LOG 2>&1
echo "--- success_ratio done rc=$? $(date -u +%T) ---" >> $LOG
echo "=== queue4 end $(date -u +%FT%TZ) ===" >> $LOG
