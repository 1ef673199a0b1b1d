#!/bin/bash
# Queue 17: push the rows that hit their queue-16 targets EARLY (they
# early-stopped with budget left, so the next count down is live) and
# extend the highest-upside long hunts. Budgets are TOTAL evals over the
# committed trial summaries. Rules (CLAUDE.md): natural completion via
# CPFLOW_MAX_EVALS, far-out safety timeouts only, ONE workload at a
# time, `touch /tmp/stop_queues` drains safely before the round-end
# bench.
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
while ! grep -q "queue16 end" $LOG 2>/dev/null; do sleep 120; done
echo "=== queue17 start $(date -u +%FT%TZ) ===" >> $LOG
# rows that hit their queue-16 target with budget to spare: go one lower
run 7200  19 120 qx_4gt5_76
run 7200  22 120 qx_alu_v3_35_chain
run 7200  26 240 qx_alu_v4_36
# near-miss beat extensions
run 7200  23 180 qx_4gt13_91_chain
run 7200  26 160 qx_4mod5_v1_24_chain
run 7200  22 260 qx_aj_e11_165
run 7200  24 160 qx_alu_v0_26_chain
run 10800 45 250 qx_one_two_three_v1_99
run 7200  26 200 qx_one_two_three_v2_100
echo "=== queue17 end $(date -u +%FT%TZ) ===" >> $LOG
