#!/usr/bin/env bash
# Pack voice dirs into release tarballs matching the download layout
# (<lang>_<name>-<type>.tar.gz containing <lang>/<name>-<type>/...,
# the format download_voice() extracts; larynx/utils.py:104-167).
# Usage: scripts/zip-voices.sh VOICES_DIR [OUT_DIR]
set -euo pipefail
VOICES_DIR="${1:?usage: zip-voices.sh VOICES_DIR [OUT_DIR]}"
OUT_DIR="${2:-dist/voices}"
mkdir -p "$OUT_DIR"
for lang_dir in "$VOICES_DIR"/*/; do
  lang="$(basename "$lang_dir")"
  for voice_dir in "$lang_dir"*/; do
    [ -d "$voice_dir" ] || continue
    name="$(basename "$voice_dir")"
    out="$OUT_DIR/${lang}_${name}.tar.gz"
    tar -C "$VOICES_DIR" -czf "$out" "$lang/$name"
    echo "$out"
  done
done
