#!/usr/bin/env python3
"""Populate a local voice-metadata tree from release artifacts.

The reference repo ships per-voice metadata (``config.json``,
``phonemes.txt``, sample sentences) under ``local/`` so tools can browse
voices before downloading checkpoints.  Those files are release artifacts;
rather than vendoring copies, this tool imports them into the package's
search path from either (a) an existing reference/voices checkout or
(b) downloaded voice tarballs.

Usage:
    python3 scripts/import_voice_metadata.py --from-dir /path/to/local
    python3 scripts/import_voice_metadata.py --download [--voices en-us_ljspeech-glow_tts ...]

Metadata lands in ``<repo>/local/<lang>/<voice>/`` by default (part of
``get_voices_dirs()``); checkpoints still download lazily on first use.
"""

import argparse
import logging
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

METADATA_FILES = ("config.json", "phonemes.txt", "GENDER")

logging.basicConfig(level=logging.INFO, format="%(message)s")
_LOGGER = logging.getLogger("import_voice_metadata")


def import_from_dir(src: Path, dest: Path) -> int:
    count = 0
    for config in sorted(src.glob("*/*/config.json")):
        voice_dir = config.parent
        lang = voice_dir.parent.name
        out = dest / lang / voice_dir.name
        out.mkdir(parents=True, exist_ok=True)
        for name in METADATA_FILES:
            f = voice_dir / name
            if f.is_file():
                shutil.copy2(f, out / name)
        samples = voice_dir / "samples"
        if samples.is_dir():
            out_samples = out / "samples"
            out_samples.mkdir(exist_ok=True)
            for f in samples.glob("test_*.txt"):
                shutil.copy2(f, out_samples / f.name)
            for f in samples.glob("test_*.csv"):
                shutil.copy2(f, out_samples / f.name)
        _LOGGER.info("imported %s/%s", lang, voice_dir.name)
        count += 1
    return count


def import_by_download(dest: Path, voices) -> int:
    from larynx_tpu.voices import (
        DEFAULT_VOICE_URL_FORMAT,
        download_voice,
        get_voice_download_name,
        list_voices,
    )

    names = voices or [name for name, _, _ in list_voices()]
    count = 0
    for name in names:
        url = DEFAULT_VOICE_URL_FORMAT.format(
            voice=get_voice_download_name(name)
        )
        try:
            download_voice(name, dest, url)
            _LOGGER.info("downloaded %s", name)
            count += 1
        except Exception as err:  # keep going; report at the end
            _LOGGER.warning("failed %s: %s", name, err)
    return count


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--from-dir", help="existing local/ metadata tree")
    parser.add_argument(
        "--download", action="store_true",
        help="download voice tarballs (checkpoints included)",
    )
    parser.add_argument(
        "--voices", nargs="*", help="subset of voice names (default: all)"
    )
    parser.add_argument(
        "--dest", default=str(Path(__file__).parent.parent / "local"),
        help="output metadata tree (default: <repo>/local)",
    )
    args = parser.parse_args()

    dest = Path(args.dest)
    if args.from_dir:
        n = import_from_dir(Path(args.from_dir), dest)
    elif args.download:
        n = import_by_download(dest, args.voices)
    else:
        parser.error("one of --from-dir or --download is required")
    _LOGGER.info("%d voice(s) -> %s", n, dest)


if __name__ == "__main__":
    main()
