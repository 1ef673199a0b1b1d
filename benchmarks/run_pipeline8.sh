#!/bin/bash
# Host pipeline 8 (round 5 continuation): the GHZ rows' exact attempts
# (pipeline 7) record "angles are not rational multiples of pi" — the
# certificate needs a pi-rational representative, so run the closed-form
# identify/snap sweep over the GHZ rows, then retry the certificate via
# prove_from_closed_form. SERIAL after pipeline 7 (shared ledgers).
cd /root/repo || exit 1
LOG=${1:-/tmp/pipeline8.log}
echo "=== pipeline8 start $(date -u +%FT%TZ) ===" >> $LOG

for i in $(seq 1 360); do
  kill -0 "$(cat /tmp/pipeline7.pid 2>/dev/null)" 2>/dev/null || break; sleep 10
done

run() {
  local t=$1; shift
  echo "--- $* start $(date -u +%T) ---" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "--- done rc=$? $(date -u +%T) ---" >> $LOG
}

run 1200 env CPFLOW_CFS_BUDGET=600 \
    python -u -m benchmarks.closed_form_sweep ghz7_adaptive
run 1500 env CPFLOW_CFS_BUDGET=600 \
    python -u -m benchmarks.closed_form_sweep ghz8_adaptive
run 1800 env CPFLOW_CFS_BUDGET=600 \
    python -u -m benchmarks.closed_form_sweep ghz9_adaptive
# retry the certificates now that closed forms may exist
run 900 python -u -m benchmarks.exact_proofs ghz7_adaptive
run 900 python -u -m benchmarks.exact_proofs ghz8_adaptive
run 900 python -u -m benchmarks.exact_proofs ghz9_adaptive

touch /tmp/pipeline8_done
echo "=== pipeline8 end $(date -u +%FT%TZ) ===" >> $LOG
