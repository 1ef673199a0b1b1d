#!/bin/bash
# Queue 31 (round 5): ablation descent (warmstart6q CPFLOW_MODE=ablate,
# RESULTS_r5 §§5-6) over EVERY composite family — the leave-one/two-out
# scan over an exact embedding found 66-CZ toffoli-6, 29-CZ toffoli-5 and
# a 34-CZ direct record in queue 29; this queue turns the same probe on:
#   1. relphase_toff6_composite (47, modulo-diagonal): every CZ saved in
#      W6 saves TWO in toffoli-7;
#   2. c5sqrtx_connected_composite (70): saves one each in toffoli-7;
#   3-5. the new records themselves (66 -> 65?, 29 -> 28?, 34 -> 33?);
#   6. toffoli7_connected_composite (144, 7q): batch 128 keeps the
#      batched unitary tensor at 16.7 MB (the ~32 MB VMEM plateau edge,
#      CLAUDE.md envelope); iters 2000 respects the dispatch-depth wall.
# ONE TPU workload at a time; timeouts are far-out safety nets.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue31.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
ablate() {
  local t=$1 src=$2; shift 2
  guard "ablate:$src" || return
  echo "--- ablate $src start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env CPFLOW_MODE=ablate CPFLOW_SOURCE="$src" "$@" \
      python -u -m benchmarks.warmstart6q >> $LOG 2>&1
  echo "--- ablate $src done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue31 start $(date -u +%FT%TZ) ===" >> $LOG

ablate 5400 relphase_toff6_composite
ablate 5400 c5sqrtx_connected_composite
ablate 5400 toffoli6_connected_composite_warmstart_66
ablate 5400 toffoli5_connected_composite_warmstart_29
ablate 5400 toffoli5_connected_record_warmstart_34
ablate 10800 toffoli7_connected_composite CPFLOW_BATCH=128

echo "=== queue31 end $(date -u +%FT%TZ) ===" >> $LOG
