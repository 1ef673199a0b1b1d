#!/bin/bash
# Queue 6: warm-pipeline CCZ timing after all search queues drain.
cd /root/repo
LOG=/tmp/queue.log
if [ -f /tmp/queue5.pid ]; then
  while kill -0 "$(cat /tmp/queue5.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== queue6 start $(date -u +%FT%TZ) ===" >> $LOG
echo "--- warm_ccz start $(date -u +%T) ---" >> $LOG
timeout 1800 python -u -m benchmarks.warm_ccz >> $LOG 2>&1
echo "--- warm_ccz done rc=$? $(date -u +%T) ---" >> $LOG
echo "--- bench start $(date -u +%T) ---" >> $LOG
timeout 3600 python -u bench.py >> $LOG 2>&1
echo "--- bench done rc=$? $(date -u +%T) ---" >> $LOG
echo "=== queue6 end $(date -u +%FT%TZ) ===" >> $LOG
