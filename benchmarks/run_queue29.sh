#!/bin/bash
# Queue 29 (round 5): re-land the results lost with the wiped gitignored
# results/ store (RESULTS_r5 §§2,5,6 were measured in-session but their
# dills never survived the VM reset; the committed trial summaries carry
# the seeds, and benchmarks/warmstart6q.py is deterministic per
# CPFLOW_SEED):
#   1. ghz7/ghz8 adaptive (optimal 6/7 CZ found on the first eval in the
#      lost run; summaries seed the TPE posterior near k=12/14, r=5e-4)
#   2. ablation warm-start scans (CPFLOW_MODE=ablate, seed 0 — the exact
#      protocol of queues 26/27): toffoli6 composite -> 67 CZ,
#      toffoli5 composite -> 29 CZ, toffoli5 record -> 34 CZ direct.
# ONE TPU workload at a time; budgets complete naturally, timeouts are
# far-out safety nets only (CLAUDE.md).
cd /root/repo || exit 1
LOG=${1:-/tmp/queue29.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
run() {
  local t=$1 cfg=$2; shift 2
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env "$@" python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
ablate() {
  local t=$1 src=$2; shift 2
  guard "ablate:$src" || return
  echo "--- ablate $src start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env CPFLOW_MODE=ablate CPFLOW_SOURCE="$src" "$@" \
      python -u -m benchmarks.warmstart6q >> $LOG 2>&1
  echo "--- ablate $src done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue29 start $(date -u +%FT%TZ) ===" >> $LOG

run 5400 ghz7_state CPFLOW_MAX_EVALS=4
run 7200 ghz8_state CPFLOW_MAX_EVALS=4

ablate 5400 toffoli6_connected_composite
ablate 5400 toffoli5_connected_composite
ablate 5400 toffoli5_connected_record

echo "=== queue29 end $(date -u +%FT%TZ) ===" >> $LOG
