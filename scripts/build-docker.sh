#!/usr/bin/env bash
# Multi-arch docker images via buildx (reference: scripts/build-docker.sh).
#
# Usage: scripts/build-docker.sh [--push] [--platforms linux/amd64,linux/arm64]
set -euo pipefail
cd "$(dirname "$0")/.."

PLATFORMS="linux/amd64,linux/arm64"
PUSH_ARG="--load"
while [ $# -gt 0 ]; do
  case "$1" in
    --push) PUSH_ARG="--push"; shift ;;
    --platforms) PLATFORMS="$2"; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

VERSION="$(python3 -c 'import re;print(re.search(r"__version__ = \"([^\"]+)\"", open("larynx_tpu/__init__.py").read()).group(1))')"

docker buildx build \
  --platform "$PLATFORMS" \
  -t "larynx-tpu:$VERSION" -t larynx-tpu:latest \
  "$PUSH_ARG" .
