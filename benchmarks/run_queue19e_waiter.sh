#!/bin/bash
# Drain-and-switch: let queue 19c's CURRENT segment finish naturally
# (never kill a TPU client mid-dispatch — CLAUDE.md), skip its remaining
# segments via the stop flag, then clear the flag and start queue 19e.
cd /root/repo || exit 1
PID=$(cat /tmp/queue19.pid)
touch /tmp/stop_queues
while kill -0 "$PID" 2>/dev/null; do sleep 20; done
rm -f /tmp/stop_queues
bash benchmarks/run_queue19e.sh /tmp/queue19.log &
echo $! > /tmp/queue19.pid
