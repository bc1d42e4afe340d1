"""End-to-end pipeline tests with a synthetic (random-weight) voice.

No released checkpoints ship in this environment, so a small random voice +
vocoder are exported to the native .npz format and loaded through the full
voice-dir machinery — exercising checkpoint resolution, config parsing,
engine construction, bucketing, batching, and audio assembly.
"""

import json

import numpy as np
import pytest

import jax

import larynx_tpu
from larynx_tpu.constants import VocoderQuality
from larynx_tpu.convert.native import save_params
from larynx_tpu.models.glow_tts import init_params as glow_init
from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan import init_params as hifi_init

VOICE_CONFIG = {
    "audio": {
        "filter_length": 1024,
        "hop_length": 256,
        "win_length": 1024,
        "mel_channels": 80,
        "sample_rate": 22050,
        "sample_bytes": 2,
        "channels": 1,
        "mel_fmin": 0.0,
        "mel_fmax": 8000.0,
        "ref_level_db": 20.0,
        "spec_gain": 1.0,
        "signal_norm": True,
        "min_level_db": -100.0,
        "max_norm": 1.0,
        "clip_norm": True,
        "symmetric_norm": True,
        "do_dynamic_range_compression": True,
        "convert_db_to_amp": True,
    },
    "model": {
        "num_symbols": 46,
        "hidden_channels": 64,
        "filter_channels": 128,
        "filter_channels_dp": 64,
        "kernel_size": 3,
        "n_blocks_dec": 3,
        "n_layers_enc": 2,
        "n_heads": 2,
        "kernel_size_dec": 5,
        "dilation_rate": 1,
        "n_block_layers": 2,
        "n_sqz": 2,
        "prenet": True,
        "mean_only": True,
        "window_size": 4,
        "n_speakers": 1,
        "n_split": 4,
    },
}

VOCODER_CONFIG = {
    "audio": {"num_mels": 80, "sampling_rate": 22050},
    "model": {
        "resblock": "2",
        "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3, 5],
        "resblock_dilation_sizes": [[1, 2], [2, 6]],
    },
}


@pytest.fixture(scope="module")
def voices_dir(tmp_path_factory, reference_dir):
    root = tmp_path_factory.mktemp("voices")

    # Voice: en-us/test_voice-glow_tts
    voice_dir = root / "en-us" / "test_voice-glow_tts"
    voice_dir.mkdir(parents=True)
    with open(voice_dir / "config.json", "w", encoding="utf-8") as f:
        json.dump(VOICE_CONFIG, f)
    phonemes_src = (
        reference_dir / "local/en-us/harvard-glow_tts/phonemes.txt"
    ).read_text(encoding="utf-8")
    (voice_dir / "phonemes.txt").write_text(phonemes_src, encoding="utf-8")

    from larynx_tpu.models.glow_tts import config_from_voice_json

    glow_cfg = config_from_voice_json(VOICE_CONFIG)
    params = glow_init(jax.random.PRNGKey(0), glow_cfg)
    save_params(voice_dir / "generator.npz", params)

    # Second voice (same params, distinct model instance) for multi-voice
    # SSML / interleaved-batching tests
    voice2_dir = root / "en-us" / "test_voice2-glow_tts"
    voice2_dir.mkdir(parents=True)
    for name in ("config.json", "phonemes.txt", "generator.npz"):
        (voice2_dir / name).write_bytes((voice_dir / name).read_bytes())

    # Vocoder: hifi_gan/vctk_small (the "low" quality preset)
    voc_dir = root / "hifi_gan" / "vctk_small"
    voc_dir.mkdir(parents=True)
    with open(voc_dir / "config.json", "w", encoding="utf-8") as f:
        json.dump(VOCODER_CONFIG, f)
    from larynx_tpu.models.hifi_gan import hifi_gan_config_from_json

    voc_cfg = hifi_gan_config_from_json(VOCODER_CONFIG)
    save_params(voc_dir / "generator.npz", hifi_init(jax.random.PRNGKey(1), voc_cfg))

    return root


def _clear_caches():
    larynx_tpu._TTS_MODEL_CACHE.clear()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    larynx_tpu._ENGINE_CACHE.clear()


def test_text_to_speech_end_to_end(voices_dir):
    _clear_caches()
    results = list(
        larynx_tpu.text_to_speech(
            "Hello world. This is a test.",
            voice_or_lang="en-us_test_voice-glow_tts",
            vocoder_or_quality=VocoderQuality.LOW,
            custom_voices_dir=voices_dir,
        )
    )
    assert len(results) == 2
    for result in results:
        assert result.audio is not None
        assert result.audio.dtype == np.int16
        assert result.audio.size > 1000
        assert result.sample_rate == 22050
        assert np.abs(result.audio).max() > 0


def test_text_to_speech_griffin_lim(voices_dir):
    _clear_caches()
    results = list(
        larynx_tpu.text_to_speech(
            "Quick test.",
            voice_or_lang="en-us_test_voice-glow_tts",
            vocoder_or_quality="griffin_lim",
            custom_voices_dir=voices_dir,
        )
    )
    assert len(results) == 1
    assert results[0].audio is not None
    assert results[0].audio.size > 1000


def test_text_to_speech_ssml_pauses(voices_dir):
    _clear_caches()
    markup = (
        '<speak>One sentence. <break time="500ms"/>Two sentence.</speak>'
    )
    results = list(
        larynx_tpu.text_to_speech(
            markup,
            voice_or_lang="en-us_test_voice-glow_tts",
            vocoder_or_quality=VocoderQuality.LOW,
            ssml=True,
            custom_voices_dir=voices_dir,
        )
    )
    assert len(results) == 2
    # second sentence carries the 500ms pause as leading silence
    lead = results[1].audio[: 500 * 22050 // 1000]
    assert np.abs(lead).max() == 0


def test_interleaved_batching_multivoice(voices_dir):
    """Non-consecutive same-voice SSML sentences batch together when
    interleaved batching is on; document order and durations match the
    streaming (consecutive-only) grouping."""
    _clear_caches()
    markup = (
        "<speak>"
        '<voice name="en-us_test_voice-glow_tts"><s>One thing here.</s></voice>'
        '<voice name="en-us_test_voice2-glow_tts"><s>Second thing now.</s></voice>'
        '<voice name="en-us_test_voice-glow_tts"><s>Third thing too.</s></voice>'
        '<voice name="en-us_test_voice2-glow_tts"><s>Fourth one done.</s></voice>'
        "</speak>"
    )
    kwargs = dict(
        voice_or_lang="en-us_test_voice-glow_tts",
        vocoder_or_quality=VocoderQuality.LOW,
        custom_voices_dir=voices_dir,
        ssml=True,
        seed=3,
    )
    base = list(
        larynx_tpu.text_to_speech(markup, interleaved_batching=False, **kwargs)
    )
    inter = list(
        larynx_tpu.text_to_speech(markup, interleaved_batching=True, **kwargs)
    )
    assert len(base) == len(inter) == 4
    # document order preserved; durations are noise-independent so they
    # must match exactly even though batch composition changed
    assert [r.text for r in base] == [r.text for r in inter]
    for a, b in zip(base, inter):
        assert a.audio is not None and b.audio is not None
        assert a.audio.shape == b.audio.shape
        assert np.abs(b.audio).max() > 0


def test_vocode_pooling_multivoice(voices_dir, monkeypatch):
    """Units that share a vocoder (multi-voice SSML) vocode as ONE pooled
    ragged launch (engine._pool_rows + a single vocode_launch) instead of
    one launch per voice; audio matches the per-unit path within the
    same +-1 int16 LSB contract as the ragged/uniform bucket tests
    (pooling only changes the padded width a row is vocoded at)."""
    _clear_caches()
    import larynx_tpu.runtime.engine as engine_module
    from larynx_tpu.runtime.engine import SynthesisEngine

    markup = (
        "<speak>"
        '<voice name="en-us_test_voice-glow_tts"><s>One thing here.</s>'
        "<s>And something much longer follows it immediately.</s></voice>"
        '<voice name="en-us_test_voice2-glow_tts"><s>Second thing now.</s></voice>'
        '<voice name="en-us_test_voice-glow_tts"><s>Third thing too.</s></voice>'
        "</speak>"
    )
    # noise_scale 0 makes the decode deterministic so the two runs are
    # comparable without a seed (a seed would disable pooling on purpose)
    kwargs = dict(
        voice_or_lang="en-us_test_voice-glow_tts",
        vocoder_or_quality=VocoderQuality.LOW,
        custom_voices_dir=voices_dir,
        ssml=True,
        tts_settings={"noise_scale": 0.0},
    )

    calls = []
    real_launch = SynthesisEngine.vocode_launch

    def counting_launch(self, *args, **kw):
        calls.append(args[2] if len(args) > 2 else kw.get("n_valid"))
        return real_launch(self, *args, **kw)

    monkeypatch.setattr(SynthesisEngine, "vocode_launch", counting_launch)
    try:
        monkeypatch.setenv("LARYNX_TPU_VOCODE_POOL", "0")
        engine_module.vocode_pool_enabled.cache_clear()
        base = list(larynx_tpu.text_to_speech(markup, **kwargs))
        per_unit_calls = len(calls)

        calls.clear()
        monkeypatch.setenv("LARYNX_TPU_VOCODE_POOL", "1")
        engine_module.vocode_pool_enabled.cache_clear()
        pooled = list(larynx_tpu.text_to_speech(markup, **kwargs))
        pooled_calls = len(calls)
    finally:
        monkeypatch.delenv("LARYNX_TPU_VOCODE_POOL", raising=False)
        engine_module.vocode_pool_enabled.cache_clear()

    # several per-voice/per-bucket units collapsed into one pooled launch
    assert per_unit_calls >= 3
    assert pooled_calls == 1
    assert calls == [4]  # every sentence row in the single pooled launch

    assert len(base) == len(pooled) == 4
    assert [r.text for r in base] == [r.text for r in pooled]
    for a, b in zip(base, pooled):
        assert a.audio is not None and b.audio is not None
        assert a.audio.shape == b.audio.shape
        diff = np.abs(a.audio.astype(np.int32) - b.audio.astype(np.int32))
        assert diff.max() <= 1, diff.max()
        assert np.abs(b.audio).max() > 0


def test_batching_determinism(voices_dir):
    """Same text + seed -> identical audio."""
    _clear_caches()
    kwargs = dict(
        voice_or_lang="en-us_test_voice-glow_tts",
        vocoder_or_quality=VocoderQuality.LOW,
        custom_voices_dir=voices_dir,
        seed=42,
    )
    a = [r.audio for r in larynx_tpu.text_to_speech("Same words here.", **kwargs)]
    b = [r.audio for r in larynx_tpu.text_to_speech("Same words here.", **kwargs)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_unfused_wrapper_path(voices_dir):
    """The parity surface: phonemes_to_mels + mels_to_audio standalone."""
    _clear_caches()
    model = larynx_tpu.get_tts_model(
        "en-us_test_voice-glow_tts", custom_voices_dir=voices_dir
    )
    assert model is not None
    ids = np.asarray([3, 5, 10, 12, 3, 2], dtype=np.int64)
    mels = model.phonemes_to_mels(ids)
    assert mels.ndim == 3 and mels.shape[1] == 80
    settings = model.audio_settings
    mels_pp = settings.dynamic_range_compression(
        settings.db_to_amp(settings.denormalize(mels))
    )

    vocoder = larynx_tpu.get_vocoder_model(
        "low", custom_voices_dir=voices_dir, denoiser_strength=0.004
    )
    audio = vocoder.mels_to_audio(mels_pp, settings={"denoiser_strength": 0.004})
    assert audio.dtype == np.int16
    assert audio.size > 0


def test_engine_warmup_api(voices_dir):
    """warmup() precompiles bucket programs without errors."""
    _clear_caches()
    import larynx_tpu

    tts = larynx_tpu.get_tts_model(
        "en-us_test_voice-glow_tts", custom_voices_dir=voices_dir
    )
    voc = larynx_tpu.get_vocoder_model("low", custom_voices_dir=voices_dir)
    engine = larynx_tpu._get_engine(tts, voc)
    engine.warmup(text_lengths=(16,), batch_sizes=(1,))
