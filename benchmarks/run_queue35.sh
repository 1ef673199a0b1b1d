#!/bin/bash
# Queue 35 (round 5): the four iterated-ablation segments that failed
# rc=1 in queue 34 (their source artifacts were not yet exported), a
# deeper GHZ-9 hunt (queue 34's 8-eval pass landed 9 CZ; optimal is 8),
# then the leave-one/two-out ablation scan over every remaining ibm_qx
# beat row (queue 34 already improved one-two-three-v0_98 43->42 and
# v1_99 46->45 with the same probe).
# ONE TPU workload at a time; /tmp/stop_queues halts between segments.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue35.log}
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
  [ -e "benchmarks/artifacts/$src.json" ] || { echo "--- ablate $src SKIPPED (no artifact) $(date -u +%T) ---" >> $LOG; return; }
  echo "--- ablate $src start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env CPFLOW_MODE=ablate CPFLOW_SOURCE="$src" "$@" \
      python -u -m benchmarks.warmstart6q >> $LOG 2>&1
  echo "--- ablate $src done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue35 start $(date -u +%FT%TZ) ===" >> $LOG

# wait for queue34 to finish (one TPU workload at a time)
for i in $(seq 1 360); do
  kill -0 "$(cat /tmp/queue34.pid 2>/dev/null)" 2>/dev/null || break; sleep 10
done

# wait for the ablate-record exports (host pipeline2) before sourcing them
for i in $(seq 1 90); do [ -e /tmp/ablate_exports_done ] && break; sleep 10; done

# deeper GHZ-9: resumed TPE posterior, bigger budget
run 3600 ghz9_state CPFLOW_MAX_EVALS=32

# iterated ablation descent on the four new fixed points
ablate 2700 toffoli5_connected_ablate27
ablate 2700 toffoli5_connected_record_ablate33
ablate 3600 toffoli6_connected_ablate65
ablate 3600 relphase_toff6_ablate46

# ablation scan over the remaining ibm_qx beat rows (5q, cheap)
ablate 2700 qx_one-two-three-v2_100
ablate 2700 qx_4gt13_92
ablate 2700 qx_aj-e11_165
ablate 2700 qx_4gt5_76
ablate 2700 qx_4gt5_76_chain
ablate 2700 qx_alu-v4_36
ablate 2700 qx_alu-v2_32
ablate 2700 qx_alu-v3_34
ablate 2700 qx_4gt13_91_chain
ablate 2700 qx_alu-v3_35_chain
ablate 2700 qx_alu-v0_26_chain
ablate 2700 qx_4mod5-v1_24_chain

echo "=== queue35 end $(date -u +%FT%TZ) ===" >> $LOG
