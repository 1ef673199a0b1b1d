#!/bin/bash
# Queue 20 (round 4): the real-TPU verify leg first (canonical CCZ drive
# + the fixed custom-loss notebook cells), then the posterior-informed
# deep hunts. Budgeted by CPFLOW_MAX_EVALS; timeouts are far-out safety
# nets only (CLAUDE.md: never kill a TPU client mid-dispatch).
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
echo "=== queue20 start $(date -u +%FT%TZ) ===" >> $LOG
guard tpu_verify && {
  echo "--- tpu verify drive start $(date -u +%T) ---" >> $LOG
  timeout 1800 python -u /tmp/vfy/drive_tpu.py >> $LOG 2>&1
  echo "--- tpu verify drive done rc=$? $(date -u +%T) ---" >> $LOG
}
guard notebook_resume && {
  echo "--- notebook resume start $(date -u +%T) ---" >> $LOG
  timeout 10800 env CPFLOW_NB_RESUME=1 \
    python -u -m benchmarks.full_notebook_run >> $LOG 2>&1
  echo "--- notebook resume done rc=$? $(date -u +%T) ---" >> $LOG
}
# deeper 6q: posterior concentrated at k=73, r~5.9e-4 but raw loss ~1e-2
# at the 2000-iter default (RESULTS_r4 section 13) -> 4x the descent depth
# inside the learned window
run 10800 toffoli6_connected_xz CPFLOW_TARGET_CZ=67 CPFLOW_MAX_EVALS=150 \
    CPFLOW_NUM_ITERS=8000 CPFLOW_MIN_K=66 CPFLOW_MAX_K=78
# ride the hot 35-CZ posterior down one more: any verified 34 is a second
# direct record
run 7200 toffoli5_connected_record CPFLOW_TARGET_CZ=34 CPFLOW_MAX_EVALS=800
echo "=== queue20 end $(date -u +%FT%TZ) ===" >> $LOG
