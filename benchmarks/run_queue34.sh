#!/bin/bash
# Queue 34 (round 5, final TPU queue): GHZ-9 retry at the resumed TPE
# posterior (first pass found 9 CZ; optimal is 8), then one more level of
# iterated ablation descent on each new fixed point (27/33/65/46), then
# the same structured probe turned on the largest ibm_qx beat rows.
# ONE TPU workload at a time; segments are eval-budgeted, timeouts are
# far-out safety nets; /tmp/stop_queues halts between segments.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue34.log}
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
echo "=== queue34 start $(date -u +%FT%TZ) ===" >> $LOG

# wait for the ablate-record exports (host pipeline2) before sourcing them
for i in $(seq 1 60); do [ -e /tmp/ablate_exports_done ] && break; sleep 10; done

run 2700 ghz9_state CPFLOW_MAX_EVALS=8

ablate 2700 toffoli5_connected_ablate27
ablate 2700 toffoli5_connected_record_ablate33
ablate 3600 toffoli6_connected_ablate65
ablate 3600 relphase_toff6_ablate46

ablate 2700 qx_one-two-three-v1_99
ablate 2700 qx_one-two-three-v0_98
ablate 2700 qx_4gt10-v1_81

echo "=== queue34 end $(date -u +%FT%TZ) ===" >> $LOG
