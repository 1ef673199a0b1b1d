#!/bin/bash
# Queue 20b: the deep 6q attempts, corrected — CPFLOW_MAX_EVALS counts
# TOTAL stored trials (resume semantics), so the queue-20 deep run with
# 150 against a 300-trial store was a no-op. 450/390 = +150 deep evals
# at 4x descent depth inside the posterior-informed k window.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue20.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
run() {
  local t=$1 cfg=$2; shift 2
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env "$@" python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue20b start $(date -u +%FT%TZ) ===" >> $LOG
run 14400 toffoli6_connected_xz CPFLOW_TARGET_CZ=67 CPFLOW_MAX_EVALS=450 \
    CPFLOW_NUM_ITERS=8000 CPFLOW_MIN_K=66 CPFLOW_MAX_K=78
run 14400 toffoli6_connected_direct CPFLOW_TARGET_CZ=67 CPFLOW_MAX_EVALS=390 \
    CPFLOW_NUM_ITERS=8000 CPFLOW_MIN_K=62 CPFLOW_MAX_K=72
echo "=== queue20b end $(date -u +%FT%TZ) ===" >> $LOG
