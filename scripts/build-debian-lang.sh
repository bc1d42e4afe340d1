#!/usr/bin/env bash
# Build per-language larynx-tpu-lang-<lang> .debs from the embedded voice
# registry (larynx_tpu/voices.py::VOICE_REGISTRY).
#
# Usage: scripts/build-debian-lang.sh [--out DIR] [LANG ...]
#   With no LANG args every registry language is built.
#
# Mirrors the reference's scripts/build-debian-lang.sh +
# debian/control.lang.in (which shipped gruut data dirs per language);
# our frontend is in-package, so the lang package carries the language's
# registry extract for offline voice listing and anchors the per-voice
# package dependencies.
set -euo pipefail

cd "$(dirname "$0")/.."
OUT="dist"
LANGS=()
while [ $# -gt 0 ]; do
  case "$1" in
    --out) OUT="$2"; shift 2 ;;
    *) LANGS+=("$1"); shift ;;
  esac
done

VERSION="$(python3 -c 'import re;print(re.search(r"__version__ = \"([^\"]+)\"", open("larynx_tpu/__init__.py").read()).group(1))')"
mkdir -p "$OUT"

ALL_LANGS="$(python3 - <<'PY'
from larynx_tpu.voices import VOICE_REGISTRY
print(" ".join(sorted({lang for lang, *_ in VOICE_REGISTRY})))
PY
)"
[ ${#LANGS[@]} -gt 0 ] || read -r -a LANGS <<< "$ALL_LANGS"

. scripts/lang-names.sh  # sourced after cd to the repo root

for LANG_CODE in "${LANGS[@]}"; do
  NAME="$(lang_name "$LANG_CODE")"
  STAGE="$(mktemp -d)"
  PKG="larynx-tpu-lang-${LANG_CODE}_${VERSION}_all"
  mkdir -p "$STAGE/$PKG/DEBIAN" \
           "$STAGE/$PKG/usr/lib/larynx-tpu/lang/$LANG_CODE"
  sed -e "s/@LANGUAGE@/$LANG_CODE/g" \
      -e "s/@LANGUAGE_NAME@/$NAME/g" \
      -e "s/@VERSION@/$VERSION/g" \
      debian/control.lang.in > "$STAGE/$PKG/DEBIAN/control"
  python3 - "$LANG_CODE" "$STAGE/$PKG/usr/lib/larynx-tpu/lang/$LANG_CODE/voices.json" <<'PY'
import json, sys
from larynx_tpu.voices import MODEL_TYPE, VOICE_REGISTRY
lang, out = sys.argv[1], sys.argv[2]
voices = [
    {
        "name": f"{l}_{n}-{MODEL_TYPE}",
        "gender": g,
        "aliases": sorted({n, f"{n}-{MODEL_TYPE}", *extras}),
    }
    for l, n, g, extras in VOICE_REGISTRY
    if l == lang
]
if not voices:
    sys.exit(f"no registry voices for language {lang!r}")
json.dump({"language": lang, "voices": voices}, open(out, "w"), indent=2)
PY
  dpkg-deb --build --root-owner-group "$STAGE/$PKG" "$OUT/$PKG.deb" >/dev/null
  rm -rf "$STAGE"
  echo "built $OUT/$PKG.deb"
done
