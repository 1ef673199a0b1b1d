#!/bin/bash
# Queue 15: follow-on hunts after queue 14 drains. Targets the rows still
# at parity (sub-published attempts on the remaining bench I/II/III
# circuits), extends the highest-upside beat hunts (one-two-three-v1_99
# saw unverified prospective 43s), and gives the 6q direct toffoli its
# first budget extension. Rules (CLAUDE.md): budgets by CPFLOW_MAX_EVALS
# (natural completion), hard timeouts only as far-out safety nets, ONE
# workload at a time, and `touch /tmp/stop_queues` skips every segment
# not yet started (safe drain before the round-end bench).
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
# Serialize behind queue 14 (marker written by run_queue14.sh).
while ! grep -q "queue14 end" $LOG 2>/dev/null; do sleep 120; done
echo "=== queue15 start $(date -u +%FT%TZ) ===" >> $LOG
# Highest upside first. Budgets are TOTAL evals (trials resume from the
# committed summaries); each segment adds ~50 evals over the stored count.
run 10800 45 190 qx_one_two_three_v1_99
run 7200  35 70  qx_4gt10_v1_81
run 7200  27 180 qx_alu_v4_36
run 7200  16 280 qx_4gt13_92
# Parity rows never pushed past the published count:
run 7200  29 75  qx_alu_v2_32
run 7200  20 75  qx_4gt5_76
run 7200  23 65  qx_alu_v3_35_chain
run 7200  21 65  qx_4gt5_76_chain
# 6q direct (xz template, VMEM-safe batch 512): first extension past 60.
run 10800 67 90  toffoli6_connected_xz
echo "=== queue15 end $(date -u +%FT%TZ) ===" >> $LOG
