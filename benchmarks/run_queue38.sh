#!/bin/bash
# Queue 38 (round 5): the GHZ ladder 10-12q (moved behind the fast
# second-generation ablations of queue 37; remote compiles at 10q+ are
# the slow part and must not block them).
cd /root/repo || exit 1
LOG=${1:-/tmp/queue38.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
run() {
  local t=$1 cfg=$2; shift 2
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env "$@" python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue38 start $(date -u +%FT%TZ) ===" >> $LOG
for i in $(seq 1 720); do
  kill -0 "$(cat /tmp/queue37.pid 2>/dev/null)" 2>/dev/null || break; sleep 30
done
run 10800 ghz10_state CPFLOW_MAX_EVALS=12
run 10800 ghz11_state CPFLOW_MAX_EVALS=10
run 14400 ghz12_state CPFLOW_MAX_EVALS=8
echo "=== queue38 end $(date -u +%FT%TZ) ===" >> $LOG
