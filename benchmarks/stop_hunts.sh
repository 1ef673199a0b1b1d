#!/bin/bash
# stop_hunts.sh — cleanly stop the hunt queues and their in-flight
# workloads so the TPU chip is free (e.g. before the driver's bench run).
# Kills ONLY explicit pid trees rooted at the recorded queue pids —
# never pattern-matches process names.
#
# Usage: bash benchmarks/stop_hunts.sh [root_pid ...]
set -u

kill_tree() { # depth-first: children before the root
  local pid=$1 child
  for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    kill_tree "$child"
  done
  kill "$pid" 2>/dev/null && echo "killed $pid"
}

roots=("$@")
for f in /tmp/hunt_queue.pid /tmp/hunt_queue2.pid /tmp/queue2_chain.pid; do
  [ -f "$f" ] && roots+=("$(cat "$f")")
done

for r in "${roots[@]:-}"; do
  [ -n "$r" ] && kill_tree "$r"
done
sleep 2
# Second pass for anything re-parented to init between scans.
for r in "${roots[@]:-}"; do
  [ -n "$r" ] && kill -9 "$r" 2>/dev/null
done
exit 0
