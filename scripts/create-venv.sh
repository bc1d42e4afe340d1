#!/usr/bin/env bash
# Development virtualenv with the package installed editable.
set -euo pipefail
cd "$(dirname "$0")/.."
python3 -m venv .venv
.venv/bin/pip install --upgrade pip
.venv/bin/pip install -e ".[dev]" 2>/dev/null || .venv/bin/pip install -e .
echo "activate with: source .venv/bin/activate"
