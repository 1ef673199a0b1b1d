#!/bin/bash
# Queue 22 (round 4): the chained-depth 6q program. Every hunt uses
# CPFLOW_GD_SEGMENTS so each DISPATCH stays at the measured-safe 4000
# iterations while the effective descent depth doubles (RESULTS_r4 s15/18).
# Hunts are split into tranches (resume-based) so /tmp/stop_queues can end
# the queue between segments without ever killing a dispatch mid-flight.
# Budgeted by CPFLOW_MAX_EVALS; timeouts are far-out safety nets only.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue22.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
run() {
  local t=$1 cfg=$2; shift 2
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env "$@" python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue22 start $(date -u +%FT%TZ) ===" >> $LOG

# Block B of toffoli-7: relphase toffoli-6, xz, chained depth. Tranche A
# is the probe (does effective-8000 move min_raw off the 1.37 floor?).
run 7200  relphase_toff6_xz CPFLOW_MAX_EVALS=60  CPFLOW_NUM_ITERS=4000 CPFLOW_GD_SEGMENTS=2 CPFLOW_ENTRY_LOSS=1e-2
run 12600 relphase_toff6_xz CPFLOW_MAX_EVALS=200 CPFLOW_NUM_ITERS=4000 CPFLOW_GD_SEGMENTS=2 CPFLOW_ENTRY_LOSS=1e-2

# Direct toffoli-6 below the 68-CZ composite: resume both posteriors at
# doubled effective depth (queue 21 ran them at single-dispatch 4000).
run 10800 toffoli6_connected_xz CPFLOW_TARGET_CZ=67 CPFLOW_MAX_EVALS=560 \
    CPFLOW_NUM_ITERS=4000 CPFLOW_GD_SEGMENTS=2 CPFLOW_ENTRY_LOSS=1e-2 CPFLOW_MIN_K=66 CPFLOW_MAX_K=78
run 10800 toffoli6_connected_xz CPFLOW_TARGET_CZ=67 CPFLOW_MAX_EVALS=660 \
    CPFLOW_NUM_ITERS=4000 CPFLOW_GD_SEGMENTS=2 CPFLOW_ENTRY_LOSS=1e-2 CPFLOW_MIN_K=66 CPFLOW_MAX_K=78
run 10800 toffoli6_connected_direct CPFLOW_TARGET_CZ=67 CPFLOW_MAX_EVALS=220 \
    CPFLOW_NUM_ITERS=4000 CPFLOW_GD_SEGMENTS=2 CPFLOW_ENTRY_LOSS=1e-2 CPFLOW_MIN_K=60 CPFLOW_MAX_K=74
run 10800 toffoli6_connected_direct CPFLOW_TARGET_CZ=67 CPFLOW_MAX_EVALS=320 \
    CPFLOW_NUM_ITERS=4000 CPFLOW_GD_SEGMENTS=2 CPFLOW_ENTRY_LOSS=1e-2 CPFLOW_MIN_K=60 CPFLOW_MAX_K=74

# GHZ ladder extension: 7q/8q state prep (state-kind column build — tiny
# working set, minutes each incl. compile). Expect optimal n-1 CZ.
run 3600 ghz7_state
run 3600 ghz8_state

guard composite && {
  echo "--- composite assembly start $(date -u +%T) ---" >> $LOG
  timeout 3600 python -u -m benchmarks.composite >> $LOG 2>&1
  echo "--- composite assembly done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue22 end $(date -u +%FT%TZ) ===" >> $LOG
