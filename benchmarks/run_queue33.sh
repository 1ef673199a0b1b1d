#!/bin/bash
# Queue 33 (round 5): GHZ-9 (extends the optimal-GHZ ladder a third level
# beyond the paper; state-kind stays cheap at 9q) and ONE deep retry of
# the toffoli-7 ablation — queue 32 floored at raw ~5e-2 with 4x2000
# chained iterations; this retry runs 16 segments (32k effective
# iterations, every dispatch at the safe 2000) with lighter rotation
# noise (sigma 3e-3) at the most productive penalty weight.
cd /root/repo || exit 1
LOG=${1:-/tmp/queue33.log}
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
echo "=== queue33 start $(date -u +%FT%TZ) ===" >> $LOG

run 10800 ghz9_state CPFLOW_MAX_EVALS=6

ablate 10800 toffoli7_connected_composite CPFLOW_BATCH=64 \
    CPFLOW_DROP_OFFSET=0 CPFLOW_SEGMENTS=16 CPFLOW_RS=0.001 \
    CPFLOW_ABLATE_SIGMA=0.003
ablate 10800 toffoli7_connected_composite CPFLOW_BATCH=64 \
    CPFLOW_DROP_OFFSET=64 CPFLOW_SEGMENTS=16 CPFLOW_RS=0.001 \
    CPFLOW_ABLATE_SIGMA=0.003
ablate 10800 toffoli7_connected_composite CPFLOW_BATCH=64 \
    CPFLOW_DROP_OFFSET=128 CPFLOW_SEGMENTS=16 CPFLOW_RS=0.001 \
    CPFLOW_ABLATE_SIGMA=0.003

echo "=== queue33 end $(date -u +%FT%TZ) ===" >> $LOG
