#!/bin/bash
# Serial beat-hunt queue (round 3 extension). Each entry resumes its
# TPE trials from benchmarks/results/<label> and early-stops at the
# target CZ count; the runner retries transient tunnel errors.
#
# Per-hunt budget = existing evals + EXTRA; parallel_trials chosen to
# keep the batched unitary tensor inside the ~32 MB VMEM plateau
# (RESULTS_r3 envelope): 5q@1024 x N=2 = 16.8 MB, 5q@2048 x N=1,
# 6q@512 x N=2 = 32 MB boundary.
#
# Usage: bash benchmarks/hunt_queue.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hunt_queue.log}

run() { # name total_evals target par timeout_s
  local name=$1 evals=$2 target=$3 par=$4 tmo=$5
  echo "=== $(date -u +%H:%M:%S) $name evals=$evals target=$target par=$par ===" >> "$LOG"
  CPFLOW_MAX_EVALS=$evals CPFLOW_TARGET_CZ=$target CPFLOW_PARALLEL_TRIALS=$par \
    timeout "$tmo" python -u -m benchmarks.configs "$name" >> "$LOG" 2>&1
  echo "=== exit=$? ===" >> "$LOG"
}

# name                      total  target par timeout
run toffoli6_connected_xz      100  67     2  3600
run toffoli6_connected_direct  100  67     2  3600
run c4sqrtx_connected          390  35     2  2700
run toffoli5_connected_record  470  35     1  2700
run qx_4gt13_92                130  16     2  1800
run qx_aj_e11_165              130  22     2  1800
run qx_4gt13_91_chain          130  23     2  1800
run qx_alu_v0_26_chain         110  24     2  1800
run qx_4mod5_v1_24_chain       110  26     2  1800
run qx_one_two_three_v2_100    150  26     2  1800
run qx_4gt10_v1_81              70  35     2  1800
run qx_alu_v4_36               180  27     2  1800
run qx_one_two_three_v0_98     120  43     2  1800
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
