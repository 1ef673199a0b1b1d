#!/bin/bash
# Sequential TPU benchmark queue for the remaining capability-table rows.
# One real chip behind the tunnel -> one config at a time, resumable state
# under benchmarks/results/. Each line of queue.log is the config's JSON.
cd /root/repo
LOG=/tmp/queue.log
echo "=== queue start $(date -u +%FT%TZ) ===" >> $LOG
for cfg in readme_ccz \
           qx_4gt10_v1_81 \
           qx_one_two_three_v0_98 \
           qx_one_two_three_v1_99 \
           qx_one_two_three_v2_100 \
           qx_4gt5_76_chain \
           qx_alu_v3_35_chain \
           qx_4mod5_v1_24_chain \
           qx_alu_v0_26_chain \
           relphase_toff4_connected \
           c3sqrtx_connected \
           toffoli5_connected; do
  echo "--- $cfg start $(date -u +%T) ---" >> $LOG
  timeout 7200 python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
done
echo "=== queue end $(date -u +%FT%TZ) ===" >> $LOG
