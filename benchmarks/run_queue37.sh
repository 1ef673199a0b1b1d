#!/bin/bash
# Queue 37 (round 5): second-generation ablation scans — iterate on every
# new fixed point from queues 34/35 (toffoli-5 at 26, the qx records at
# 42/45/34/24) and retry qx_aj-e11_165 with the padded-wire embedding fix.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue37.log}
guard() { [ -e /tmp/stop_queues ] && { echo "--- $1 SKIPPED (stop_queues) $(date -u +%T) ---" >> $LOG; return 1; }; return 0; }
ablate() {
  local t=$1 src=$2; shift 2
  guard "ablate:$src" || return
  [ -e "benchmarks/artifacts/$src.json" ] || { echo "--- ablate $src SKIPPED (no artifact) $(date -u +%T) ---" >> $LOG; return; }
  echo "--- ablate $src start $(date -u +%T) [$*] ---" >> $LOG
  timeout "$t" env CPFLOW_MODE=ablate CPFLOW_SOURCE="$src" "$@" \
      python -u -m benchmarks.warmstart6q >> $LOG 2>&1
  echo "--- ablate $src done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue37 start $(date -u +%FT%TZ) ===" >> $LOG

for i in $(seq 1 720); do
  kill -0 "$(cat /tmp/queue35.pid 2>/dev/null)" 2>/dev/null || break; sleep 30
done
# give the host pipelines a beat to export the new artifacts
for i in $(seq 1 60); do [ -e /tmp/pipeline6_done ] && break; sleep 20; done

ablate 2700 toffoli5_connected_ablate26
ablate 2700 qx_aj-e11_165
ablate 2700 qx_one-two-three-v0_98_warmstart_42
ablate 2700 qx_one-two-three-v1_99_warmstart_45
ablate 2700 qx_4gt10-v1_81_warmstart_34
ablate 2700 qx_one-two-three-v2_100_warmstart_24
ablate 2700 qx_alu-v2_32_warmstart_24
ablate 2700 qx_alu-v4_36_warmstart_26
ablate 2700 qx_alu-v3_35_chain

echo "=== queue37 end $(date -u +%FT%TZ) ===" >> $LOG
