#!/bin/bash
# Queue 39 (round 5 continuation): recover the three queue-35 records
# lost to the VM reset (their PROOF_STATUS rows are pre-registered at
# 24/26/24 CX; the scans are deterministic at CPFLOW_SEED=0), then the
# second-generation scan over the 26-CZ toffoli-5 record (probe 25).
# Each scan is immediately landed green (export -> polish -> re-verify
# -> ledger row) by benchmarks.land_new_results so a session end at any
# point leaves the tree committable. ONE TPU workload at a time: waits
# for bench.py (/tmp/bench.pid) before the first dispatch.
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
echo "=== queue39 start $(date -u +%FT%TZ) ===" >> $LOG

# wait for bench.py to release the chip
for i in $(seq 1 360); do
  kill -0 "$(cat /tmp/bench.pid 2>/dev/null)" 2>/dev/null || break; sleep 10
done

ablate 2700 qx_one-two-three-v2_100
ablate 2700 qx_alu-v2_32
ablate 2700 qx_alu-v4_36
ablate 2700 toffoli5_connected_ablate26

echo "=== queue39 end $(date -u +%FT%TZ) ===" >> $LOG
