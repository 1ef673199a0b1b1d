#!/bin/bash
# Sequential TPU benchmark queue, value-ordered. One real chip behind the
# tunnel -> one config at a time; all adaptive runs are resumable under
# benchmarks/results/. Waits for any in-flight run (PID in /tmp/bench.pid).
cd /root/repo
LOG=/tmp/queue.log
if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== rebalanced queue start $(date -u +%FT%TZ) ===" >> $LOG

run() {  # run <timeout_s> <env...> -- <module> <args...>
  local t=$1; shift
  echo "--- $* start $(date -u +%T) ---" >> $LOG
  timeout "$t" env "$@" >> $LOG 2>&1
  echo "--- done rc=$? $(date -u +%T) ---" >> $LOG
}

# composite blocks + headline rows first
run 4000 python -u -m benchmarks.configs relphase_toff4_connected
run 4000 python -u -m benchmarks.configs c3sqrtx_connected
run 3000 python -u -m benchmarks.configs toffoli5_connected
run 600  python -u -m benchmarks.composite
# remaining group-III circuit at full budget
run 7200 python -u -m benchmarks.configs qx_one_two_three_v1_99
# cheap capability/measurement rows
run 3000 python -u -m benchmarks.configs toffoli3_chain
run 1800 python -u -m benchmarks.configs ghz6_state
run 600  python -u -m benchmarks.configs readme_ccz
run 4000 python -u -m benchmarks.success_ratio 512 2000
# group I/II gap circuits at capped budgets (resumable; extend if time)
run 4000 CPFLOW_MAX_EVALS=60 python -u -m benchmarks.configs qx_one_two_three_v2_100
run 4000 CPFLOW_MAX_EVALS=60 python -u -m benchmarks.configs qx_4gt5_76_chain
run 4000 CPFLOW_MAX_EVALS=60 python -u -m benchmarks.configs qx_alu_v3_35_chain
run 4000 CPFLOW_MAX_EVALS=60 python -u -m benchmarks.configs qx_4mod5_v1_24_chain
run 4000 CPFLOW_MAX_EVALS=60 python -u -m benchmarks.configs qx_alu_v0_26_chain
# hardest hunt last (reads the toffoli5 adaptive trials)
run 7200 python -u -m benchmarks.configs toffoli5_static_assault
echo "=== rebalanced queue end $(date -u +%FT%TZ) ===" >> $LOG
