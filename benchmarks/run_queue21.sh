#!/bin/bash
# Queue 21 (round 4): the toffoli-7 program. Two new block hunts
# (C4(X^1/4) at 5q, relative-phase toffoli-6 at 6q), then the host-side
# composite assembly (both V-recursion identity levels are exact,
# tests/test_compat_shim.py). Budgeted by CPFLOW_MAX_EVALS; timeouts are
# far-out safety nets only.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue21.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
run() {
  local t=$1 cfg=$2; shift 2
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env "$@" python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue21 start $(date -u +%FT%TZ) ===" >> $LOG
run 9000 c4xroot4_connected CPFLOW_MAX_EVALS=250
run 10800 relphase_toff6_connected CPFLOW_MAX_EVALS=300
# deep 6q at the MEASURED safe depth: 8000-iter dispatches crash the
# worker at startup (4 reproductions, queue 20b); single-eval probes
# pass at 4000 and at the narrowed window (RESULTS_r4)
run 10800 toffoli6_connected_xz CPFLOW_TARGET_CZ=67 CPFLOW_MAX_EVALS=460 \
    CPFLOW_NUM_ITERS=4000 CPFLOW_MIN_K=66 CPFLOW_MAX_K=78
run 10800 toffoli6_connected_direct CPFLOW_TARGET_CZ=67 CPFLOW_MAX_EVALS=400 \
    CPFLOW_NUM_ITERS=4000 CPFLOW_MIN_K=62 CPFLOW_MAX_K=72
guard composite && {
  echo "--- composite assembly start $(date -u +%T) ---" >> $LOG
  timeout 3600 python -u -m benchmarks.composite >> $LOG 2>&1
  echo "--- composite assembly done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue21 end $(date -u +%FT%TZ) ===" >> $LOG
