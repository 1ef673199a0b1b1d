#!/bin/bash
# Round-4 closed-form sweep queue (host CPU only; VERDICT item 3):
# the two new beat rows first, then raised-budget retries of the four
# DFS-stalled rows, then a re-attempt of the freshly polished rows.
cd /root/repo || exit 1
LOG=${1:-/tmp/cfs_r4.log}
run() { # run <budget> <label...>
  local b=$1; shift
  echo "=== cfs budget=$b $* $(date -u +%T) ===" >> $LOG
  CPFLOW_CFS_BUDGET=$b timeout 14400 python -u -m benchmarks.closed_form_sweep "$@" >> $LOG 2>&1
  echo "=== rc=$? $(date -u +%T) ===" >> $LOG
}
run 500  qx_one-two-three-v2_100 qx_4mod5-v1_24_chain
run 2000 qx_alu-v4_36
run 2000 qx_4gt5_76
run 2000 qx_4gt5_76_chain
run 500  qx_one-two-three-v0_98
