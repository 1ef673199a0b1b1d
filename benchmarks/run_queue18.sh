#!/bin/bash
# Queue 18: post-queue-17 extensions. 4mod5-v1_24_chain hit its 26
# target at 115/160 evals (early stop -> 25 is live); the other rows
# near-missed their queue-17 targets with flat TPE tails, so they get
# one more budget slice; c4sqrtx sub-36 would improve the composite
# toffoli-6 (68 = 14 relphase-toff5 + c4sqrtx + inverse assembly).
# Budgets are TOTAL evals over the committed trial summaries. Rules
# (CLAUDE.md): natural completion via CPFLOW_MAX_EVALS, far-out safety
# timeouts only, ONE workload at a time, `touch /tmp/stop_queues`
# drains safely before the round-end bench.
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
while ! grep -q "queue17 end" $LOG 2>/dev/null; do sleep 120; done
echo "=== queue18 start $(date -u +%FT%TZ) ===" >> $LOG
run 7200  25 240 qx_4mod5_v1_24_chain
run 7200  24 240 qx_alu_v0_26_chain
run 7200  23 260 qx_4gt13_91_chain
run 7200  23 340 qx_aj_e11_165
run 9999  35 580 c4sqrtx_connected
echo "=== queue18 end $(date -u +%FT%TZ) ===" >> $LOG
