#!/usr/bin/env bash
# Test runner (parity: reference scripts/run-tests.sh)
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
