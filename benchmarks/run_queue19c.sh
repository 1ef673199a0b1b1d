#!/bin/bash
# Queue 19c: jit-fixed anneal rescues, then everything queue 19b skipped.
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
  local t=$1; shift
  guard "$*" || return
  echo "--- $* start $(date -u +%T) ---" >> $LOG
  timeout "$t" env CPFLOW_REVERIFY_ANNEAL=$ANNEAL python -u -m "$@" >> $LOG 2>&1
  echo "--- $* done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue19c start $(date -u +%FT%TZ) ===" >> $LOG
ANNEAL=1
mod 7200 benchmarks.reverify v199_43
mod 7200 benchmarks.reverify toffoli5_record_34
ANNEAL=
guard bench && timeout 1800 python -u bench.py >> $LOG 2>&1
run 9000 67 150 toffoli6_connected_xz
run 9000 67 120 toffoli6_connected_direct
run 7200 21 165 qx_4gt5_76_chain
run 7200 29 175 qx_alu_v2_32
run 7200 43 210 qx_one_two_three_v0_98
run 5400 16 360 qx_4gt13_92
run 5400 22 420 qx_aj_e11_165
run 7200 45 330 qx_one_two_three_v1_99
run 7200 35 640 toffoli5_connected_record
echo "=== queue19c end $(date -u +%FT%TZ) ===" >> $LOG
