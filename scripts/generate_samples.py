#!/usr/bin/env python3
"""Generate per-voice sample WAVs + an HTML demo page.

Parity with the reference's scripts/generate-samples.sh +
bin/make_sample_html.py: for every locally installed voice, synthesize its
language's pangram at each quality level and write
``<out>/<lang>/<voice>/samples/*.wav`` plus ``<out>/index.html``.
"""

import argparse
import html
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

PANGRAMS = {
    "en-us": (
        "The beige hue on the waters of the loch impressed all, including "
        "the French queen, before she heard that symphony again, just as "
        "young Arthur wanted."
    ),
    "es-es": (
        "Benjamín pidió una bebida de kiwi y fresa; Noé, sin vergüenza, la "
        "más exquisita champaña del menú."
    ),
    "de-de": "Falsches Üben von Xylophonmusik quält jeden größeren Zwerg.",
    "fr-fr": "Buvez de ce whisky que le patron juge fameux.",
    "it-it": "Ma la volpe, col suo balzo, ha raggiunto il quieto Fido.",
    "nl": "Pa's wijze lynx bezag vroom het fikse aquaduct.",
    "ru-ru": (
        "Широкая электрификация южных губерний даст мощный толчок подъёму "
        "сельского хозяйства."
    ),
    "sv-se": "Yxskaftbud, ge vår WC-zonmö IQ-hjälp.",
    "sw": "Gari langu linaloangama limejaa na mikunga.",
}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--voices-dir", help="Voice search dir")
    parser.add_argument("--output-dir", default="samples_out")
    parser.add_argument(
        "--quality", action="append", default=[], help="Quality levels (repeatable)"
    )
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()
    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    import larynx_tpu
    from larynx_tpu.io import wavfile
    from larynx_tpu.voices import get_voices_dirs, valid_voice_dir

    qualities = args.quality or ["high"]
    out_root = Path(args.output_dir)
    rows = []

    for voices_dir in get_voices_dirs(args.voices_dir):
        if not voices_dir.is_dir():
            continue
        for lang_dir in sorted(voices_dir.iterdir()):
            if not lang_dir.is_dir() or lang_dir.name in ("hifi_gan", "waveglow"):
                continue
            lang = lang_dir.name
            text = PANGRAMS.get(lang)
            if not text:
                continue
            for voice_dir in sorted(lang_dir.iterdir()):
                if not valid_voice_dir(voice_dir):
                    continue
                voice = f"{lang}_{voice_dir.name}"
                for quality in qualities:
                    try:
                        results = list(
                            larynx_tpu.text_to_speech(
                                text,
                                voice_or_lang=voice,
                                vocoder_or_quality=quality,
                                custom_voices_dir=args.voices_dir,
                            )
                        )
                    except Exception:
                        logging.exception("Failed: %s (%s)", voice, quality)
                        continue
                    import numpy as np

                    audio = np.concatenate([r.audio for r in results])
                    sample_dir = out_root / lang / voice_dir.name / "samples"
                    sample_dir.mkdir(parents=True, exist_ok=True)
                    wav_path = sample_dir / f"pangram_{quality}.wav"
                    wavfile.write(wav_path, results[0].sample_rate, audio)
                    rel = wav_path.relative_to(out_root)
                    rows.append((voice, quality, str(rel), text))
                    logging.info("Wrote %s", wav_path)

    items = "\n".join(
        f"<tr><td>{html.escape(v)}</td><td>{q}</td>"
        f"<td><audio controls src='{html.escape(p)}'></audio></td>"
        f"<td>{html.escape(t)}</td></tr>"
        for v, q, p, t in rows
    )
    (out_root / "index.html").write_text(
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>Larynx TPU samples</title></head><body>"
        "<h1>Voice samples</h1><table border='1'>"
        "<tr><th>Voice</th><th>Quality</th><th>Audio</th><th>Text</th></tr>"
        f"{items}</table></body></html>",
        encoding="utf-8",
    )
    logging.info("Wrote %s sample(s); index at %s", len(rows), out_root / "index.html")


if __name__ == "__main__":
    main()
