#!/bin/bash
# Queue 11 (final): re-synthesize the six r1-only ibm_qx rows so the
# committed-artifact set covers the ENTIRE paper table. Hard per-item caps;
# queue self-terminates in time for the driver's bench.
cd /root/repo
LOG=/tmp/queue.log
echo "=== queue11 start $(date -u +%FT%TZ) ===" >> $LOG
for cfg in qx_4gt13_91_chain qx_alu_v3_34 qx_4gt5_76 qx_4gt13_92 qx_alu_v2_32 qx_alu_v4_36; do
  echo "--- $cfg start $(date -u +%T) ---" >> $LOG
  timeout 1500 python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
done
echo "=== queue11 end $(date -u +%FT%TZ) ===" >> $LOG
