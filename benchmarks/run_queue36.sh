#!/bin/bash
# Queue 36 (round 5): extend the GHZ ladder beyond 9q — each n is an
# independent adaptive hunt; state-kind tensors stay tiny (8-32 MB at
# batch 1024) so remote compile time is the only real cost. Far-out
# timeouts are safety nets; eval budgets do the real bounding.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue36.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
run() {
  local t=$1 cfg=$2; shift 2
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env "$@" python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue36 start $(date -u +%FT%TZ) ===" >> $LOG

# one TPU workload at a time: wait for queue35
for i in $(seq 1 720); do
  kill -0 "$(cat /tmp/queue35.pid 2>/dev/null)" 2>/dev/null || break; sleep 30
done

run 10800 ghz10_state CPFLOW_MAX_EVALS=12
run 10800 ghz11_state CPFLOW_MAX_EVALS=10
run 14400 ghz12_state CPFLOW_MAX_EVALS=8

echo "=== queue36 end $(date -u +%FT%TZ) ===" >> $LOG
