#!/usr/bin/env bash
# Auto-format (black/isort when installed; no-ops gracefully offline).
set -e
cd "$(dirname "$0")/.."
ran=0
command -v black >/dev/null && { black larynx_tpu tests; ran=1; }
command -v isort >/dev/null && { isort larynx_tpu tests; ran=1; }
[ "$ran" = 1 ] || echo "black/isort not installed; nothing to do"
