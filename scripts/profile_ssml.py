#!/usr/bin/env python3
"""Per-phase breakdown of the multilingual-SSML bench workload (the 4x
RTF outlier: BASELINE config 4).

The ssml workload synthesizes a 4-block document over THREE voices
(en-us / de-de / sw) with interleaved batching, so the work arrives as
three small per-voice units (4 + 1 + 1 sentences) instead of one batch-8
unit.  This script runs the exact bench markup and measures, per unit
and in isolation (block_until_ready between stages):

  frontend   SSML parse + G2P + id encoding (host Python)
  encode     per-unit encoder dispatch+compute
  y_sync     y_lengths D2H round trip
  decode     flow decode dispatch+compute
  vocode     vocoder dispatch+compute
  collect    audio D2H + crop

plus the production pipelined wall for the same document, so the gap
between (sum of isolated phases) and the wall shows how much the
overlap already hides — and what floor remains (dispatch round trips ×
units, audio bytes / link bandwidth).

Run on the real chip:  python scripts/profile_ssml.py [-n 5]
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import larynx_tpu  # noqa: E402
from bench import LENGTH_SCALE, _make_voice_dirs  # noqa: E402

MARKUP = """<speak>
  <voice name="en-us_bench_en-glow_tts">The beige hue on the waters of
  the loch impressed all. Just as young Arthur wanted.</voice>
  <break time="300ms"/>
  <voice name="de-de_bench_de-glow_tts"><s lang="de">Falsches Üben von
  Xylophonmusik quält jeden größeren Zwerg.</s></voice>
  <voice name="sw_bench_sw-glow_tts"><s lang="sw">Gari langu
  linaloangama limejaa na mikunga.</s></voice>
  <voice name="en-us_bench_en-glow_tts">Before she heard that symphony
  again. Including the French queen.</voice>
</speak>"""


def main() -> None:
    trials = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv else 5
    voices_dir = _make_voice_dirs("high")

    tts_kwargs = dict(
        voice_or_lang="en-us_bench_en-glow_tts",
        vocoder_or_quality="high",
        ssml=True,
        custom_voices_dir=voices_dir,
        tts_settings={"length_scale": LENGTH_SCALE},
        denoiser_strength=0.0,
    )

    # ---- warmup: build engines, compile every bucket program
    audio_s = 0.0
    for r in larynx_tpu.text_to_speech(
        MARKUP, interleaved_batching=True, **tts_kwargs
    ):
        audio_s += r.audio.shape[-1] / 22050
    print(f"document audio: {audio_s:.1f}s", file=sys.stderr)

    # ---- isolated phases: drive the same units by hand
    from larynx_tpu import _build_jobs  # type: ignore[attr-defined]

    phases = {k: [] for k in (
        "frontend", "encode", "y_sync", "decode", "vocode", "collect",
        "iso_total", "pipelined",
    )}
    unit_info = []
    import jax

    for _ in range(trials):
        t0 = time.perf_counter()
        jobs = _build_jobs(
            MARKUP,
            "en-us_bench_en-glow_tts",
            "high",
            ssml=True,
            custom_voices_dir=voices_dir,
        )
        t_frontend = time.perf_counter() - t0

        # interleaved grouping, same as _run_jobs
        groups = {}
        for job in jobs:
            key = (id(job["tts_model"]), id(job["vocoder_model"]))
            groups.setdefault(key, []).append(job)

        t_enc = t_sync = t_dec = t_voc = t_col = 0.0
        unit_info = []
        for key, gjobs in groups.items():
            engine = larynx_tpu._get_engine(
                gjobs[0]["tts_model"], gjobs[0]["vocoder_model"]
            )
            ids = [j["ids"] for j in gjobs]
            n = len(ids)

            t0 = time.perf_counter()
            enc_out, g = engine.encode_launch(ids, LENGTH_SCALE)
            jax.block_until_ready(enc_out)
            t_enc += time.perf_counter() - t0

            t0 = time.perf_counter()
            y_lengths = np.asarray(enc_out[4])
            t_sync += time.perf_counter() - t0

            t0 = time.perf_counter()
            mel, z_mask, kkey = engine.decode_launch(enc_out, y_lengths, g, n)
            jax.block_until_ready(mel)
            t_dec += time.perf_counter() - t0

            t0 = time.perf_counter()
            parts = engine.vocode_launch(
                mel, z_mask, n, 0.0, kkey, y_lengths=y_lengths
            )
            jax.block_until_ready([p for p, _ in parts])
            t_voc += time.perf_counter() - t0

            t0 = time.perf_counter()
            rows = engine.vocode_collect(parts, mel.shape[0])
            engine.crop_rows(rows, y_lengths, n, 0.0)
            t_col += time.perf_counter() - t0

            unit_info.append(
                f"unit n={n} mel_bucket={mel.shape[1]} parts={len(parts)}"
            )

        phases["frontend"].append(t_frontend * 1e3)
        phases["encode"].append(t_enc * 1e3)
        phases["y_sync"].append(t_sync * 1e3)
        phases["decode"].append(t_dec * 1e3)
        phases["vocode"].append(t_voc * 1e3)
        phases["collect"].append(t_col * 1e3)
        phases["iso_total"].append(
            (t_frontend + t_enc + t_sync + t_dec + t_voc + t_col) * 1e3
        )

        # ---- production pipelined wall
        t0 = time.perf_counter()
        total = 0
        for r in larynx_tpu.text_to_speech(
            MARKUP, interleaved_batching=True, **tts_kwargs
        ):
            total += r.audio.shape[-1]
        phases["pipelined"].append((time.perf_counter() - t0) * 1e3)

    for line in unit_info:
        print(line, file=sys.stderr)
    print(f"{'phase':10s} {'median ms':>10s}  (n={trials})", file=sys.stderr)
    for k, vals in phases.items():
        print(f"{k:10s} {statistics.median(vals):10.1f}", file=sys.stderr)
    wall = statistics.median(phases["pipelined"])
    print(
        f"pipelined RTF: {wall / 1e3 / audio_s:.5f} over {audio_s:.1f}s audio",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
