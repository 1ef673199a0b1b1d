#!/bin/bash
# Queue 39b (round 5 continuation): the three queue-39 segments skipped
# by the stop_queues pause that let bench.py warm the workload cache on
# the free chip. Same recovery + land-green discipline as queue 39.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue39.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
ablate() {
  local t=$1 src=$2; shift 2
  guard "ablate:$src" || return
  [ -e "benchmarks/artifacts/$src.json" ] || { echo "--- ablate $src SKIPPED (no artifact) $(date -u +%T) ---" >> $LOG; return; }
  echo "--- ablate $src start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env CPFLOW_MODE=ablate CPFLOW_SOURCE="$src" "$@" \
      python -u -m benchmarks.warmstart6q >> $LOG 2>&1
  echo "--- ablate $src done rc=$? $(date -u +%T) ---" >> $LOG
  echo "--- land start $(date -u +%T) ---" >> $LOG
  timeout 2400 python -u -m benchmarks.land_new_results >> $LOG 2>&1
  echo "--- land done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue39b start $(date -u +%FT%TZ) ===" >> $LOG

# wait for bench.py to release the chip
for i in $(seq 1 360); do
  kill -0 "$(cat /tmp/bench.pid 2>/dev/null)" 2>/dev/null || break; sleep 10
done

ablate 2700 qx_alu-v2_32
ablate 2700 qx_alu-v4_36
ablate 2700 toffoli5_connected_ablate26

echo "=== queue39b end $(date -u +%FT%TZ) ===" >> $LOG
