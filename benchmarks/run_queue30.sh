#!/bin/bash
# Queue 30 (round 5, host CPU): drain the proof queue (VERDICT r4 item 6).
# Waits for the export_composites job (pid file $2) to release the solo
# core, then:
#   1. squeeze-preprocessed closed_form_sweep over the pending row
#      (relphase_c4sqrtx_connected) and the dfs_stalled rows — the
#      squeeze pass (circuits/refine.py) kills cross-wire gauge freedoms
#      the same-wire reducer can't see and was never applied to these.
#   2. exact_proofs sweep so every (re)exported artifact has a ledger row.
# Host CPU only — safe to run alongside the TPU queue (which waits on
# remote compiles).
cd /root/repo || exit 1
LOG=${1:-/tmp/queue30.log}
WAIT_PID=${2:-}
echo "=== queue30 start $(date -u +%FT%TZ) ===" >> $LOG
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "--- export job $WAIT_PID finished $(date -u +%T) ---" >> $LOG
fi

echo "--- exact_proofs sweep start $(date -u +%T) ---" >> $LOG
timeout 14400 python -u -m benchmarks.exact_proofs >> $LOG 2>&1
echo "--- exact_proofs done rc=$? $(date -u +%T) ---" >> $LOG

echo "--- squeeze sweep (pending + dfs_stalled) start $(date -u +%T) ---" >> $LOG
timeout 21600 env CPFLOW_CFS_SQUEEZE=1 CPFLOW_CFS_BUDGET=1000 \
    python -u -m benchmarks.closed_form_sweep \
    relphase_c4sqrtx_connected qx_alu-v4_36 qx_4gt5_76 qx_4gt5_76_chain \
    qx_4mod5-v1_24_chain qx_one-two-three-v2_100 c4xroot4_connected \
    >> $LOG 2>&1
echo "--- squeeze sweep done rc=$? $(date -u +%T) ---" >> $LOG
echo "=== queue30 end $(date -u +%FT%TZ) ===" >> $LOG
