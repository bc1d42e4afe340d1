#!/usr/bin/env bash
# RTF benchmark (parity: reference scripts/benchmark-voices.sh)
# Runs the pangram workload at each quality level and prints JSON lines.
set -e
cd "$(dirname "$0")/.."
python bench.py "$@"
