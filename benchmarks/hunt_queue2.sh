#!/bin/bash
# Serial beat-hunt queue #2 (round 3, after hunt_queue.sh drains).
# One TPU workload at a time — two concurrent workloads through the axon
# tunnel reproducibly crash the worker (RESULTS_r3 §16). Hunts resume
# their TPE trials from benchmarks/results/<label> and early-stop at the
# target; budgets below exceed the stored trial counts so every entry
# actually extends its hunt.
#
# Usage: bash benchmarks/hunt_queue2.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hunt_queue2.log}

run() { # name total_evals target par timeout_s
  local name=$1 evals=$2 target=$3 par=$4 tmo=$5
  echo "=== $(date -u +%H:%M:%S) $name evals=$evals target=$target par=$par ===" >> "$LOG"
  CPFLOW_MAX_EVALS=$evals CPFLOW_TARGET_CZ=$target CPFLOW_PARALLEL_TRIALS=$par \
    timeout "$tmo" python -u -m benchmarks.configs "$name" >> "$LOG" 2>&1
  echo "=== exit=$? ===" >> "$LOG"
}

# Re-runs of the queue-1 entries burned by the stale-queue TPU contention
# (RESULTS_r3 §16), then fresh ground: parity rows with few stored evals
# and published-1 targets, then the deep resumes.
# name                      total  target par timeout
run qx_aj_e11_165             200  22     2  1800
run qx_4gt13_91_chain         140  23     2  1800
run qx_alu_v0_26_chain        120  24     2  1800
run qx_4mod5_v1_24_chain      120  26     2  1800
run qx_alu_v3_34               80  13     2  1800
run qx_alu_v3_35_chain         80  23     2  1800
run qx_4gt5_76                100  20     2  1800
run qx_4gt5_76_chain           80  21     2  1800
run qx_alu_v2_32              100  29     2  1800
run qx_one_two_three_v1_99    220  45     2  2700
run qx_4gt13_92               260  16     2  1800
run toffoli5_connected_record 560  35     1  2700
run c4sqrtx_connected         400  35     1  2700
run toffoli6_connected_xz     120  67     1  3600
run toffoli6_connected_direct 120  67     1  3600
python -m benchmarks.trials_store export-all >> "$LOG" 2>&1
echo "=== QUEUE2 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
