#!/bin/bash
# Host pipeline 7 (round 5 continuation): serial proof attempts for the
# pending ledger rows lost to the VM reset. SERIAL because both tools
# write the shared ledgers (exact_proofs.json / closed_forms.json) —
# never run two writers concurrently (ARCHITECTURE.md, serial ledger
# discipline). Host-CPU only; bounded per label so the pipeline ends
# within the session and results can be committed green.
cd /root/repo || exit 1
LOG=${1:-/tmp/pipeline7.log}
echo "=== pipeline7 start $(date -u +%FT%TZ) ===" >> $LOG

run() {
  local t=$1; shift
  echo "--- $* start $(date -u +%T) ---" >> $LOG
  timeout "$t" env "$@" >> $LOG 2>&1
  echo "--- done rc=$? $(date -u +%T) ---" >> $LOG
}

# GHZ certificates: the state residual landed last session; these rows
# have never had a post-normalization attempt.
run 1500 python -u -m benchmarks.exact_proofs ghz7_adaptive
run 1500 python -u -m benchmarks.exact_proofs ghz8_adaptive
run 1500 python -u -m benchmarks.exact_proofs ghz9_adaptive

# The 26-CZ toffoli-5 record: first closed-form attempt.
run 1200 env CPFLOW_CFS_BUDGET=800 \
    python -u -m benchmarks.closed_form_sweep toffoli5_connected_ablate26

touch /tmp/pipeline7_done
echo "=== pipeline7 end $(date -u +%FT%TZ) ===" >> $LOG
