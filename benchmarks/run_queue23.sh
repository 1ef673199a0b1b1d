#!/bin/bash
# Queue 23 (round 4): the 5q block program for toffoli-6/7 composites.
# The composite-W6 identity (tests/test_composite_w6.py) reduces block B
# of toffoli-7 to 5q hunts, which converge reliably where 6q floors:
#   - relphase_c4sqrtx_connected: the gauged inner block of W6
#   - relphase_toff5_xz: sub-14 W5 (counts 2x in toffoli-6, W6, C5sqrtX)
# Composite assembly runs IMMEDIATELY after the 5q hunts so toffoli-7
# lands even if later segments die; then the GHZ ladder and a W6-direct
# tranche B at chained depth; then a final re-assembly.
#
# Budgets (CLAUDE.md: segments must complete NATURALLY, timeouts are
# far-out safety nets only): 5q hunts measured ~34 s/eval (queue 21,
# c4xroot4 250 evals / 8467 s) -> 80 evals ~ 45 min vs 3 h net. The 6q
# chained-depth config ran <60 evals in 2 h (queue 22 rc=124) -> 30
# evals ~ 1-1.5 h vs 3 h net.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue23.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
run() {
  local t=$1 cfg=$2; shift 2
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env "$@" python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
compose() {
  guard composite || return
  echo "--- composite assembly + export start $(date -u +%T) ---" >> $LOG
  timeout 3600 python -u -m benchmarks.export_composites >> $LOG 2>&1
  echo "--- composite export done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue23 start $(date -u +%FT%TZ) ===" >> $LOG

run 10800 relphase_c4sqrtx_connected CPFLOW_MAX_EVALS=80
run 10800 relphase_toff5_xz CPFLOW_MAX_EVALS=80

compose

run 5400 ghz7_state
run 5400 ghz8_state

# W6-direct tranche B: resume the chained-depth xz hunt (tranche A ran in
# queue 22); a direct W6 cheaper than the composite would lower toffoli-7
run 10800 relphase_toff6_xz CPFLOW_MAX_EVALS=30 CPFLOW_NUM_ITERS=4000 \
    CPFLOW_GD_SEGMENTS=2 CPFLOW_ENTRY_LOSS=1e-2

compose
echo "=== queue23 end $(date -u +%FT%TZ) ===" >> $LOG
