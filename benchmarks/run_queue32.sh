#!/bin/bash
# Queue 32 (round 5): ablation descent on toffoli-7 itself (144 CZ, 7q).
# The VMEM guard caps the 7q batch at 64 (k-scaled working set 58 MB at
# k=144), so the single-drop scan windows over CPFLOW_DROP_OFFSET
# 0/64/128 — one compiled executable serves all three runs (same shapes,
# persistent cache). Every CZ saved here is a direct record improvement
# two recursion levels beyond the paper.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue32.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
ablate() {
  local t=$1 src=$2; shift 2
  guard "ablate:$src" || return
  echo "--- ablate $src start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env CPFLOW_MODE=ablate CPFLOW_SOURCE="$src" "$@" \
      python -u -m benchmarks.warmstart6q >> $LOG 2>&1
  echo "--- ablate $src done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue32 start $(date -u +%FT%TZ) ===" >> $LOG

ablate 10800 toffoli7_connected_composite CPFLOW_BATCH=64 CPFLOW_DROP_OFFSET=0
ablate 7200 toffoli7_connected_composite CPFLOW_BATCH=64 CPFLOW_DROP_OFFSET=64
ablate 7200 toffoli7_connected_composite CPFLOW_BATCH=64 CPFLOW_DROP_OFFSET=128

echo "=== queue32 end $(date -u +%FT%TZ) ===" >> $LOG
