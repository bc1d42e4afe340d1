#!/bin/sh
# Run every BENCH_NOTES config sequentially (one TPU process at a time)
# and append each bench.py JSON line to the given output file.
# Usage: scripts/bench_sweep.sh out.jsonl [skip-default]
set -u
OUT="${1:-/tmp/bench_sweep.jsonl}"
: > "$OUT"
run() {
  echo "=== bench.py $* ===" >&2
  timeout 900 python bench.py "$@" 2>/dev/null | grep '^{' | tail -1 >> "$OUT"
}
if [ "${2:-}" != "skip-default" ]; then
  run
fi
run --quality medium
run --quality low
run --quality griffin_lim
run --quality waveglow
run --workload book
run --workload ssml
run --workload server
run --workload stream
echo "sweep done" >&2
