#!/bin/bash
# TPU-tunnel recovery watcher. The axon relay (externally spawned; cannot
# be restarted from this VM) died with the queue-13 hard-timeout kill
# (RESULTS_r3 §18 follow-up): every relay port refuses connections and
# backend init hangs forever. This watcher probes with a bounded
# subprocess (same pattern as bench.py:_backend_alive) and, on recovery,
# launches the given queue script exactly once.
#
# Usage: bash benchmarks/watch_tpu.sh [queue_script]
cd /root/repo || exit 1
QUEUE=${1:-benchmarks/run_queue14.sh}
LOG=/tmp/tpu_watch.log
echo "=== watcher start $(date -u +%FT%TZ) queue=$QUEUE ===" >> "$LOG"
while true; do
  if timeout 240 python -c 'import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))' >> "$LOG" 2>&1; then
    echo "tunnel ALIVE $(date -u +%FT%TZ) — launching $QUEUE" >> "$LOG"
    nohup bash "$QUEUE" >> "$LOG" 2>&1 &
    echo $! > /tmp/queue14.pid
    exit 0
  fi
  echo "tunnel dead $(date -u +%FT%TZ)" >> "$LOG"
  sleep 600
done
