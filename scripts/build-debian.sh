#!/usr/bin/env bash
# Build a larynx-tpu .deb with a bundled virtualenv.
#
# Usage: scripts/build-debian.sh [--arch amd64|arm64] [--no-deps] [--out DIR]
#
#   --no-deps  skip pip-installing jax/aiohttp into the venv (offline CI:
#              the venv then only carries larynx_tpu itself and the deb
#              declares the python3 dependency; useful as a smoke test of
#              the packaging itself)
#
# Mirrors the reference's debian packaging (debian/control*.in +
# scripts/build-debian.sh), minus the armv7 targets — TPU serving hosts
# are amd64/arm64.
set -euo pipefail

cd "$(dirname "$0")/.."
ARCH="$(dpkg --print-architecture 2>/dev/null || echo amd64)"
WITH_DEPS=1
OUT="dist"
while [ $# -gt 0 ]; do
  case "$1" in
    --arch) ARCH="$2"; shift 2 ;;
    --no-deps) WITH_DEPS=0; shift ;;
    --out) OUT="$2"; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

VERSION="$(python3 -c 'import re;print(re.search(r"__version__ = \"([^\"]+)\"", open("larynx_tpu/__init__.py").read()).group(1))')"
PKG="larynx-tpu_${VERSION}_${ARCH}"
STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT

mkdir -p "$STAGE/$PKG/DEBIAN" \
         "$STAGE/$PKG/usr/bin" \
         "$STAGE/$PKG/usr/lib/larynx-tpu"

sed -e "s/@VERSION@/$VERSION/g" -e "s/@ARCH@/$ARCH/g" \
    debian/control.in > "$STAGE/$PKG/DEBIAN/control"

# self-contained venv with the package (and deps unless --no-deps).
# The wheel builds with the host python (its setuptools), so this also
# works on offline/zero-egress build machines with --no-deps.
python3 -m pip wheel --quiet --no-deps --no-build-isolation \
    -w "$STAGE/wheels" .
python3 -m venv "$STAGE/$PKG/usr/lib/larynx-tpu/venv"
VENV_PIP="$STAGE/$PKG/usr/lib/larynx-tpu/venv/bin/pip"
if [ "$WITH_DEPS" = "1" ]; then
  "$VENV_PIP" install --quiet "$STAGE/wheels"/*.whl
else
  "$VENV_PIP" install --quiet --no-index --no-deps "$STAGE/wheels"/*.whl
fi
# venvs embed absolute build paths; rewrite for the install prefix
sed -i "s|$STAGE/$PKG||g" \
    "$STAGE/$PKG/usr/lib/larynx-tpu/venv/bin/"* 2>/dev/null || true

install -m 0755 debian/larynx-tpu "$STAGE/$PKG/usr/bin/larynx-tpu"
install -m 0755 debian/larynx-tpu-server "$STAGE/$PKG/usr/bin/larynx-tpu-server"

mkdir -p "$OUT"
dpkg-deb --build --root-owner-group "$STAGE/$PKG" "$OUT/$PKG.deb"
echo "built $OUT/$PKG.deb"
