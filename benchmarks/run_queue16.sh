#!/bin/bash
# Queue 16: consolidated relaunch after the VM restart wiped /tmp and cut
# queue 14 mid-drain (qx_4gt13_92 reached its 220-eval budget; nothing
# after it ran, and queue 15 never started). Budgets below are TOTAL
# evals — each run resumes from the committed trial summary and adds the
# difference. Rules (CLAUDE.md): natural completion via CPFLOW_MAX_EVALS,
# hard timeouts only as far-out safety nets, ONE TPU workload at a time,
# `touch /tmp/stop_queues` drains safely before the round-end bench.
cd /root/repo || exit 1
LOG=/tmp/queue.log
run() { # run <safety_timeout> <target_cz> <max_evals_total> <config>
  local t=$1 tgt=$2 ev=$3 cfg=$4
  if [ -e /tmp/stop_queues ]; then
    echo "--- $cfg SKIPPED (stop_queues flag) $(date -u +%T) ---" >> $LOG
    return
  fi
  echo "--- $cfg start $(date -u +%T) target=$tgt evals<=$ev ---" >> $LOG
  timeout "$t" env CPFLOW_TARGET_CZ="$tgt" CPFLOW_MAX_EVALS="$ev" \
    python -u -m benchmarks.configs "$cfg" >> $LOG 2>&1
  echo "--- $cfg done rc=$? $(date -u +%T) ---" >> $LOG
}
echo "=== queue16 start $(date -u +%FT%TZ) ===" >> $LOG
# Highest upside first (queue-15 rationale: v1_99 saw prospective 43s).
run 10800 45 190 qx_one_two_three_v1_99
run 7200  27 180 qx_alu_v4_36
run 7200  16 280 qx_4gt13_92
run 7200  35 70  qx_4gt10_v1_81
# queue-14 remnants (segments lost to the restart):
run 7200  43 130 qx_one_two_three_v0_98
run 7200  22 200 qx_aj_e11_165
run 7200  26 100 qx_4mod5_v1_24_chain
run 7200  26 140 qx_one_two_three_v2_100
run 7200  24 100 qx_alu_v0_26_chain
run 7200  23 120 qx_4gt13_91_chain
# parity rows never pushed past the published count (queue 15):
run 7200  29 75  qx_alu_v2_32
run 7200  20 75  qx_4gt5_76
run 7200  23 65  qx_alu_v3_35_chain
run 7200  21 65  qx_4gt5_76_chain
# 6q direct (xz template, VMEM-safe batch 512): first extension past 60.
run 10800 67 90  toffoli6_connected_xz
# long-tail record hunts last (largest budgets, lowest marginal upside):
run 9999  35 540 toffoli5_connected_record
run 9999  35 460 c4sqrtx_connected
echo "=== queue16 end $(date -u +%FT%TZ) ===" >> $LOG
