#!/usr/bin/env python3
"""Benchmark: real-time factor of the full synthesis pipeline.

Mirrors the reference methodology (scripts/benchmark-voices.sh: per-language
pangram, 1 warm-up + 3 timed runs; RTF = synth-time / audio-duration, lower
is better) on the flagship configuration: GlowTTS harvard dims + HiFi-GAN
universal_large geometry at high quality.  Weights are random (no released
checkpoints ship in this environment) — RTF depends only on shapes/FLOPs,
not weight values; ``length_scale`` is set so durations match real voices
(~6 mel frames per phoneme id).

Prints ONE JSON line:
  {"metric": "...", "value": RTF, "unit": "...", "vs_baseline": N}
where vs_baseline = reference_RTF / our_RTF (x-times faster than the
published i7-8750H high-quality RTF of 0.25, BASELINE.md).
"""

import json
import sys
import time

import numpy as np

import jax

from larynx_tpu.audio import AudioSettings
from larynx_tpu.models.glow_tts import GlowTTSConfig
from larynx_tpu.models.glow_tts.model import init_params as glow_init
from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan.model import init_params as hifi_init
from larynx_tpu.runtime.engine import SynthesisEngine
from larynx_tpu.text.frontend import sentences
from larynx_tpu.text.ids import phonemes_to_ids

BASELINE_RTF_HIGH = 0.25  # i7-8750H, high quality (BASELINE.md)

# 46-symbol en-us voice inventory (local/en-us/harvard-glow_tts/phonemes.txt)
PHONEME_TABLE = {
    "_": 0, "|": 1, "‖": 2, "#": 3, "ˈ": 4, "ˌ": 5, "aɪ": 6, "aʊ": 7,
    "b": 8, "d": 9, "d͡ʒ": 10, "eɪ": 11, "f": 12, "h": 13, "i": 14,
    "j": 15, "k": 16, "l": 17, "m": 18, "n": 19, "oʊ": 20, "p": 21,
    "s": 22, "t": 23, "t͡ʃ": 24, "u": 25, "v": 26, "w": 27, "z": 28,
    "æ": 29, "ð": 30, "ŋ": 31, "ɑ": 32, "ɔ": 33, "ɔɪ": 34, "ə": 35,
    "ɚ": 36, "ɛ": 37, "ɡ": 38, "ɪ": 39, "ɹ": 40, "ʃ": 41, "ʊ": 42,
    "ʌ": 43, "ʒ": 44, "θ": 45,
}

PANGRAM = (
    "The beige hue on the waters of the loch impressed all, including the "
    "French queen, before she heard that symphony again, just as young "
    "Arthur wanted."
)

LENGTH_SCALE = 6.0  # random weights emit ~1 frame/id; real voices ~6


def main() -> None:
    half = "--half" in sys.argv

    glow_cfg = GlowTTSConfig()
    hifi_cfg = HiFiGanConfig()  # universal_large geometry (high quality)
    audio_settings = AudioSettings(
        signal_norm=True, max_norm=1.0, symmetric_norm=True, clip_norm=True
    )

    key = jax.random.PRNGKey(0)
    glow_params = glow_init(key, glow_cfg)
    voc_params = hifi_init(jax.random.fold_in(key, 1), hifi_cfg)

    engine = SynthesisEngine(
        glow_params,
        glow_cfg,
        audio_settings,
        vocoder_kind="hifi_gan",
        vocoder_params=voc_params,
        vocoder_cfg=hifi_cfg,
        half=half,
        seed=1234,
    )

    # Text -> ids through the real frontend
    id_seqs = []
    for sent in sentences(PANGRAM, lang="en-us"):
        word_phonemes = [w.phonemes for w in sent if w.phonemes]
        ids = phonemes_to_ids(word_phonemes, PHONEME_TABLE)
        id_seqs.append(np.asarray(ids, dtype=np.int64))
    # server-style batch: 8 concurrent sentences
    batch = (id_seqs * 8)[:8]

    def run_once():
        audios = engine.synthesize_batch(
            batch, length_scale=LENGTH_SCALE, denoiser_strength=0.005
        )
        return sum(a.shape[-1] for a in audios) / audio_settings.sample_rate

    # warm-up (compilation)
    t0 = time.perf_counter()
    audio_sec = run_once()
    warmup_time = time.perf_counter() - t0

    profile_dir = None
    if "--profile" in sys.argv:
        profile_dir = "/tmp/larynx_tpu_profile"
        try:
            jax.profiler.start_trace(profile_dir)
        except Exception:  # profiling unsupported on some backends
            profile_dir = None

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        audio_sec = run_once()
        times.append(time.perf_counter() - t0)

    if profile_dir:
        try:
            jax.profiler.stop_trace()
            print(f"# profiler trace written to {profile_dir}", file=sys.stderr)
        except Exception:
            pass

    synth_time = float(np.median(times))
    rtf = synth_time / audio_sec
    device = jax.devices()[0]

    result = {
        "metric": "rtf_high_quality_batch8",
        "value": round(rtf, 6),
        "unit": "synth_sec_per_audio_sec",
        "vs_baseline": round(BASELINE_RTF_HIGH / rtf, 2),
        "audio_sec_per_run": round(audio_sec, 2),
        "synth_sec_per_run": round(synth_time, 4),
        "warmup_sec": round(warmup_time, 2),
        "device": str(device),
        "half": half,
        "batch": len(batch),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
