#!/usr/bin/env bash
# Lint/style gate (parity: reference scripts/check-code.sh ran
# flake8+pylint+mypy+black+isort). In this environment those tools are
# not installed, so the always-on gate is the vendored AST checker
# (scripts/lint_lite.py) + compileall; flake8 ADDS checks when present.
# This script fails loudly — it never silently degrades.
set -e
cd "$(dirname "$0")/.."
python -m compileall -q larynx_tpu
python scripts/lint_lite.py larynx_tpu scripts bench.py __graft_entry__.py
python - <<'PY'
import subprocess, sys
try:
    import flake8  # noqa
except ImportError:
    print(
        "check-code: flake8 not installed — vendored lint_lite gate ran "
        "instead (install flake8 for the full check)",
        file=sys.stderr,
    )
    sys.exit(0)
sys.exit(subprocess.call([sys.executable, "-m", "flake8", "larynx_tpu",
                          "--max-line-length", "100",
                          "--extend-ignore", "E203,W503,E501"]))
PY
echo "check-code: OK"
