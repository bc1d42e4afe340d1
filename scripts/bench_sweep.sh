#!/bin/sh
# Run every BENCH_NOTES config sequentially (one TPU process at a time)
# and write each bench.py JSON line to the given output file (the file is
# OVERWRITTEN at start; per-config stderr is kept in $OUT.<config>.log).
# A config that crashes or times out appends an {"error": ...} marker line
# instead of silently vanishing from the sweep.
# Usage: scripts/bench_sweep.sh out.jsonl [skip-default]
set -u
OUT="${1:-/tmp/bench_sweep.jsonl}"
: > "$OUT"
run() {
  tag=$(echo "$*" | tr -s ' -' '_' | sed 's/^_*//;s/_*$//')
  [ -n "$tag" ] || tag=default
  log="$OUT.$tag.log"
  raw="$OUT.$tag.out"
  echo "=== bench.py $* ===" >&2
  timeout 900 python bench.py "$@" >"$raw" 2>"$log"
  rc=$?
  grep '^{' "$raw" | tail -1 >> "$OUT"
  rm -f "$raw"
  if [ "$rc" -ne 0 ]; then
    echo "{\"metric\": \"$tag\", \"error\": \"exit $rc (124=timeout); see $log\"}" >> "$OUT"
    echo "!!! bench.py $* failed (exit $rc), stderr in $log" >&2
  fi
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
run --workload tacotron2
echo "sweep done" >&2
