#!/bin/bash
# Queue 40 (round 5 continuation): second-generation ablation scans over
# the three recovered records (probe 23/23/25), then the first GHZ-10
# hunt at a small eval budget. Land-green discipline after every scan.
# /tmp/stop_queues halts between segments (end-of-session chip release).
cd /root/repo || exit 1
LOG=${1:-/tmp/queue40.log}
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
run() {
  local t=$1 cfg=$2; shift 2
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env "$@" python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue40 start $(date -u +%FT%TZ) ===" >> $LOG

ablate 2700 qx_one-two-three-v2_100_warmstart_24
ablate 2700 qx_alu-v2_32_warmstart_24
ablate 2700 qx_alu-v4_36_warmstart_26

# GHZ-10: small budget; state-kind tensors stay tiny, the 10q remote
# compile is the real cost. Eval budget does the bounding.
run 5400 ghz10_state CPFLOW_MAX_EVALS=6
echo "--- ghz10 land start $(date -u +%T) ---" >> $LOG
timeout 2400 python -u -m benchmarks.land_new_results >> $LOG 2>&1
echo "--- ghz10 land done rc=$? $(date -u +%T) ---" >> $LOG

echo "=== queue40 end $(date -u +%FT%TZ) ===" >> $LOG
