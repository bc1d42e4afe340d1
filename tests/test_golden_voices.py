"""Refactor guard in the reference's test style (NOT absolute correctness).

Mirrors tests/test_text_to_speech.py:34-105 in the reference: for each
golden sample (committed WAV + sentence text), run the FULL real pipeline
and assert fuzzy invariants — mean signal energy above a floor (not
silence) and duration within tolerance of the golden sample.

Scope caveat: the golden WAVs are SELF-PRODUCED by this pipeline with a
random-init synthetic voice (seed 7) — they pin the pipeline's behavior
against refactors, nothing more.  Absolute waveform correctness is
anchored elsewhere: the torch-oracle parity suites
(test_glow_tts_parity.py, test_waveform_parity.py) check the math
against the reference implementation directly; no released checkpoints
exist in this environment to anchor real voices.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax

import larynx_tpu
from larynx_tpu.io import wavfile

GOLDEN_DIR = Path(__file__).parent / "golden"

from test_pipeline import VOICE_CONFIG, VOCODER_CONFIG  # noqa: E402


@pytest.fixture(scope="module")
def golden_voices_dir(tmp_path_factory, reference_dir):
    from larynx_tpu.convert.native import save_params
    from larynx_tpu.models.glow_tts import config_from_voice_json
    from larynx_tpu.models.glow_tts import init_params as glow_init
    from larynx_tpu.models.hifi_gan import hifi_gan_config_from_json
    from larynx_tpu.models.hifi_gan import init_params as hifi_init

    root = tmp_path_factory.mktemp("golden_voices")
    voice_dir = root / "en-us" / "golden_voice-glow_tts"
    voice_dir.mkdir(parents=True)
    json.dump(VOICE_CONFIG, open(voice_dir / "config.json", "w"))
    (voice_dir / "phonemes.txt").write_text(
        (reference_dir / "local/en-us/harvard-glow_tts/phonemes.txt").read_text(
            encoding="utf-8"
        ),
        encoding="utf-8",
    )
    save_params(
        voice_dir / "generator.npz",
        glow_init(jax.random.PRNGKey(0), config_from_voice_json(VOICE_CONFIG)),
    )
    voc_dir = root / "hifi_gan" / "vctk_small"
    voc_dir.mkdir(parents=True)
    json.dump(VOCODER_CONFIG, open(voc_dir / "config.json", "w"))
    save_params(
        voc_dir / "generator.npz",
        hifi_init(
            jax.random.PRNGKey(1), hifi_gan_config_from_json(VOCODER_CONFIG)
        ),
    )
    return root


def _golden_sentences():
    out = {}
    with open(GOLDEN_DIR / "test_sentences.txt", encoding="utf-8") as f:
        for line in f:
            name, text = line.strip().split("|")
            out[name] = text
    return out


@pytest.mark.parametrize("name", sorted(_golden_sentences()))
def test_check_voice(golden_voices_dir, name):
    """The reference's check_voice invariants (tests/test_text_to_speech.py:
    76-105): non-silent output, duration within tolerance of the golden."""
    larynx_tpu._TTS_MODEL_CACHE.clear()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    larynx_tpu._ENGINE_CACHE.clear()

    text = _golden_sentences()[name]
    rate, golden = wavfile.read(GOLDEN_DIR / f"{name}.wav")

    results = list(
        larynx_tpu.text_to_speech(
            text,
            voice_or_lang="en-us_golden_voice-glow_tts",
            vocoder_or_quality="low",
            custom_voices_dir=golden_voices_dir,
            seed=7,
            tts_settings={"length_scale": 5.0},
            denoiser_strength=0.0,
        )
    )
    audio = np.concatenate([r.audio for r in results])

    # 1. not silence (reference used energy > 25.0 on int16 audio)
    energy = np.mean(np.abs(audio.astype(np.float64)))
    assert energy > 25.0, f"audio is silent-ish: energy={energy}"

    # 2. duration within 1 second of the golden sample
    ours_sec = audio.shape[0] / rate
    golden_sec = golden.shape[0] / rate
    assert abs(ours_sec - golden_sec) < 1.0, (ours_sec, golden_sec)

    # 3. deterministic contract: same seed reproduces the exact duration
    assert audio.shape[0] == golden.shape[0]
