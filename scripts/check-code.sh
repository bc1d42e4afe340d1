#!/usr/bin/env bash
# Lint/style gate (parity: reference scripts/check-code.sh)
set -e
cd "$(dirname "$0")/.."
python -m compileall -q larynx_tpu
python - <<'PY'
import subprocess, sys
try:
    import flake8  # noqa
    sys.exit(subprocess.call([sys.executable, "-m", "flake8", "larynx_tpu",
                              "--max-line-length", "100",
                              "--extend-ignore", "E203,W503,E501"]))
except ImportError:
    print("flake8 not installed; compileall check only")
PY
