#!/usr/bin/env bash
# Build per-voice larynx-tpu-voice-<lang>-<voice> .debs from a voices
# directory tree (<dir>/<lang>/<voice_dir>/{config.json,phonemes.txt,
# checkpoint}).
#
# Usage: scripts/build-debian-voice.sh [--out DIR] [--voices-dir DIR] [LANG ...]
#   --voices-dir defaults to ./local (the same place the runtime search
#   chain looks).  With LANG args only those languages are packaged.
#
# Mirrors the reference's scripts/build-debian-voice.sh +
# debian/control.voice.in; installed voices land in
# /usr/lib/larynx-tpu/voices/<lang>/ which larynx_tpu.voices.
# get_voices_dirs searches by default.
set -euo pipefail

cd "$(dirname "$0")/.."
OUT="dist"
VOICES_DIR="local"
LANGS=()
while [ $# -gt 0 ]; do
  case "$1" in
    --out) OUT="$2"; shift 2 ;;
    --voices-dir) VOICES_DIR="$2"; shift 2 ;;
    *) LANGS+=("$1"); shift ;;
  esac
done

VERSION="$(python3 -c 'import re;print(re.search(r"__version__ = \"([^\"]+)\"", open("larynx_tpu/__init__.py").read()).group(1))')"
mkdir -p "$OUT"

want_lang() {
  [ ${#LANGS[@]} -eq 0 ] && return 0
  for l in "${LANGS[@]}"; do [ "$l" = "$1" ] && return 0; done
  return 1
}

. scripts/lang-names.sh  # sourced after cd to the repo root

BUILT=0
for LANG_DIR in "$VOICES_DIR"/*/; do
  [ -d "$LANG_DIR" ] || continue
  LANG_CODE="$(basename "$LANG_DIR")"
  case "$LANG_CODE" in hifi_gan|waveglow) continue ;; esac  # vocoders
  want_lang "$LANG_CODE" || continue
  NAME="$(lang_name "$LANG_CODE")"
  for VOICE_DIR in "$LANG_DIR"*/; do
    [ -d "$VOICE_DIR" ] || continue
    VOICE_BASE="$(basename "$VOICE_DIR")"
    # debian package names use dashes; keep the dir name as-is inside
    VOICE="$(echo "$VOICE_BASE" | tr '_' '-')"
    STAGE="$(mktemp -d)"
    PKG="larynx-tpu-voice-${LANG_CODE}-${VOICE}_${VERSION}_all"
    mkdir -p "$STAGE/$PKG/DEBIAN" \
             "$STAGE/$PKG/usr/lib/larynx-tpu/voices/$LANG_CODE"
    sed -e "s/@LANGUAGE@/$LANG_CODE/g" \
        -e "s/@LANGUAGE_NAME@/$NAME/g" \
        -e "s/@VOICE@/$VOICE/g" \
        -e "s/@VERSION@/$VERSION/g" \
        debian/control.voice.in > "$STAGE/$PKG/DEBIAN/control"
    cp -R "$VOICE_DIR" \
        "$STAGE/$PKG/usr/lib/larynx-tpu/voices/$LANG_CODE/$VOICE_BASE"
    dpkg-deb --build --root-owner-group "$STAGE/$PKG" "$OUT/$PKG.deb" >/dev/null
    rm -rf "$STAGE"
    echo "built $OUT/$PKG.deb"
    BUILT=$((BUILT + 1))
  done
done
[ "$BUILT" -gt 0 ] || { echo "no voice dirs found under $VOICES_DIR" >&2; exit 1; }
