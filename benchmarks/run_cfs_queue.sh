#!/bin/bash
# Host closed-form-search queue (CPU only, no TPU). Serializes behind any
# currently running closed-form jobs (single-core VM), then:
#   1. reruns the two rows that errored under the pre-aab8911 tool
#      (polyroots maxsteps, division guard),
#   2. sweeps the ibm_qx rows never tried (ROADMAP: "try closed_form_search
#      on MORE qx rows").
# Results: one JSON line per label in /tmp/cfs_qx.log.
cd /root/repo || exit 1
LOG=/tmp/cfs_qx.log
for pid in "$@"; do
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
done
echo "=== cfs queue start $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 28800 python -u -m benchmarks.closed_form_sweep \
  c4sqrtx_connected qx_4gt10-v1_81 \
  qx_aj-e11_165 qx_alu-v0_26_chain qx_alu-v2_32 qx_alu-v3_35_chain \
  qx_alu-v4_36 qx_one-two-three-v2_100 qx_one-two-three-v0_98 \
  qx_one-two-three-v1_99 >> "$LOG" 2>&1
echo "=== cfs queue end $(date -u +%FT%TZ) rc=$? ===" >> "$LOG"
