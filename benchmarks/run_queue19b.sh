#!/bin/bash
# Queue 19b: penalty-annealed rescue of the two reproduced prospectives
# (34-CZ toffoli-5 blew up under hard CP projection: 6.6e-5 -> 9.6e-3;
# 43-CX v1_99 stalls shallowly at 4.0e-4), then the queue-19 segments the
# restructure skipped. Same rules as run_queue19.sh.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue19.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
run() {
  local t=$1 tgt=$2 ev=$3 cfg=$4
  guard "$cfg" || return
  echo "--- $cfg start $(date -u +%T) target=$tgt evals<=$ev ---" >> $LOG
  timeout "$t" env CPFLOW_TARGET_CZ="$tgt" CPFLOW_MAX_EVALS="$ev" \
    python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
mod() {
  local t=$1 m=$2; shift 2
  guard "$m $*" || return
  echo "--- $m $* start $(date -u +%T) ---" >> $LOG
  timeout "$t" python -u -m "$m" "$@" >> $LOG 2>&1
  echo "--- $m $* done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue19b start $(date -u +%FT%TZ) ===" >> $LOG
export CPFLOW_REVERIFY_ANNEAL=1
mod 7200 benchmarks.reverify v199_43
mod 7200 benchmarks.reverify toffoli5_record_34
unset CPFLOW_REVERIFY_ANNEAL
guard bench && timeout 1800 python -u bench.py >> $LOG 2>&1
mod 14400 benchmarks.full_notebook_run
run 9000 67 150 toffoli6_connected_xz
run 9000 67 120 toffoli6_connected_direct
run 7200 21 165 qx_4gt5_76_chain
run 7200 29 175 qx_alu_v2_32
run 7200 43 210 qx_one_two_three_v0_98
run 5400 16 360 qx_4gt13_92
run 5400 22 420 qx_aj_e11_165
run 7200 45 330 qx_one_two_three_v1_99
run 7200 35 640 toffoli5_connected_record
echo "=== queue19b end $(date -u +%FT%TZ) ===" >> $LOG
