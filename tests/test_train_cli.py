"""End-to-end training smoke test: tiny synthetic dataset -> voice dir ->
inference loads and synthesizes with the trained checkpoint."""

import json

import numpy as np
import pytest

from larynx_tpu.io import wavfile

# reuse the small voice config
from test_pipeline import VOICE_CONFIG


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory, reference_dir):
    root = tmp_path_factory.mktemp("train_data")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    texts = [
        "Hello world.",
        "A voice is born.",
        "Testing one two three.",
        "The quick brown fox.",
    ]
    rows = []
    for i, text in enumerate(texts):
        # ~0.6-1.2 s of noise-modulated tone as stand-in speech
        n = int(22050 * (0.6 + 0.15 * i))
        t = np.arange(n) / 22050.0
        audio = (
            0.3 * np.sin(2 * np.pi * (120 + 20 * i) * t)
            + 0.05 * rng.standard_normal(n)
        ).astype(np.float32)
        wavfile.write(wav_dir / f"utt{i}.wav", 22050, (audio * 32767).astype(np.int16))
        rows.append(f"utt{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(rows), encoding="utf-8")

    config = dict(VOICE_CONFIG)
    config_path = root / "config.json"
    config_path.write_text(json.dumps(config), encoding="utf-8")

    phonemes_path = root / "phonemes.txt"
    phonemes_path.write_text(
        (reference_dir / "local/en-us/harvard-glow_tts/phonemes.txt").read_text(
            encoding="utf-8"
        ),
        encoding="utf-8",
    )
    return root


def test_train_vocoder_cli_end_to_end(tiny_dataset, tmp_path):
    """Vocoder training: wav dir -> a few GAN steps -> model dir that
    get_vocoder_model loads and vocodes with."""
    import larynx_tpu
    from larynx_tpu.train_vocoder import main as train_vocoder_main

    cfg_path = tmp_path / "voc.json"
    cfg_path.write_text(
        json.dumps(
            {
                "model": {
                    "resblock": "2",
                    "upsample_initial_channel": 32,
                    "upsample_rates": [8, 8, 4],
                    "upsample_kernel_sizes": [16, 16, 8],
                    "resblock_kernel_sizes": [3],
                    "resblock_dilation_sizes": [[1, 2]],
                }
            }
        ),
        encoding="utf-8",
    )
    voc_dir = tmp_path / "voices" / "hifi_gan" / "tiny"
    train_vocoder_main(
        [
            "--wav-dir", str(tiny_dataset / "wavs"),
            "--out-dir", str(voc_dir),
            "--config", str(cfg_path),
            "--segment-frames", "16",
            "--batch-size", "2",
            "--steps", "3",
            "--checkpoint-every", "1000",
        ]
    )
    assert (voc_dir / "generator.npz").is_file()
    assert (voc_dir / "config.json").is_file()

    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    voc = larynx_tpu.get_vocoder_model(
        "hifi_gan/tiny", custom_voices_dir=tmp_path / "voices",
        no_download=True,
    )
    assert voc is not None
    mels = np.log(
        np.maximum(1e-5, np.random.default_rng(0).uniform(0, 2, (80, 24)))
    ).astype(np.float32)
    audio = voc.mels_to_audio(mels)
    assert audio.size == 24 * 256 and np.isfinite(
        audio.astype(np.float32)
    ).all()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()


def test_train_vocoder_cli_waveglow(tiny_dataset, tmp_path):
    """--family waveglow trains the flow NLL and writes a dir that
    get_vocoder_model('waveglow') loads."""
    import larynx_tpu
    from larynx_tpu.train_vocoder import main as train_vocoder_main

    cfg_path = tmp_path / "wg.json"
    cfg_path.write_text(
        json.dumps(
            {
                "mel_channels": 80, "sampling_rate": 22050, "flows": 2,
                "groups": 8, "early_every": 2, "early_size": 2,
                "wn_kernel_size": 3, "wn_channels": 16, "wn_layers": 1,
                "upsample_kernel": 512, "upsample_stride": 256,
            }
        ),
        encoding="utf-8",
    )
    voc_dir = tmp_path / "voices" / "waveglow" / "wn_256"
    train_vocoder_main(
        [
            "--family", "waveglow",
            "--wav-dir", str(tiny_dataset / "wavs"),
            "--out-dir", str(voc_dir),
            "--config", str(cfg_path),
            "--segment-frames", "8",
            "--batch-size", "2",
            "--steps", "3",
            "--sigma", "0.7",
            "--checkpoint-every", "1000",
        ]
    )
    assert (voc_dir / "generator.npz").is_file()

    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    voc = larynx_tpu.get_vocoder_model(
        "waveglow", custom_voices_dir=tmp_path / "voices", no_download=True
    )
    assert voc is not None
    # the trained prior scale is recorded and used at inference
    assert voc.sigma == pytest.approx(0.7)
    # the saved 1x1 inverses match the TRAINED weights (regression: w_inv
    # received zero gradients and stayed at the inverse of the init)
    for flow in voc.params["flows"]:
        w = np.asarray(flow["convinv"]["w"])
        w_inv = np.asarray(flow["convinv"]["w_inv"])
        np.testing.assert_allclose(
            w @ w_inv, np.eye(w.shape[0]), atol=1e-4
        )
    mels = np.log(
        np.maximum(1e-5, np.random.default_rng(0).uniform(0, 2, (80, 12)))
    ).astype(np.float32)
    audio = voc.mels_to_audio(mels)
    assert audio.size == 12 * 256 and np.isfinite(
        audio.astype(np.float32)
    ).all()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()


def test_train_cli_tacotron2(tiny_dataset, tmp_path):
    """--family tacotron2: a few teacher-forced steps -> voice dir the
    standard inference path loads (num_symbols auto-sized from
    phonemes.txt and persisted into the written config.json)."""
    from larynx_tpu.train import main as train_main

    cfg_path = tmp_path / "t2.json"
    cfg_path.write_text(
        json.dumps(
            {
                "audio": {},
                "model": {
                    "symbols_embedding_dim": 32,
                    "encoder_embedding_dim": 32,
                    "encoder_n_convolutions": 1,
                    "prenet_dim": 16,
                    "attention_rnn_dim": 48,
                    "decoder_rnn_dim": 48,
                    "attention_dim": 24,
                    "attention_location_n_filters": 8,
                    "attention_location_kernel_size": 15,
                    "postnet_embedding_dim": 32,
                    "postnet_n_convolutions": 2,
                    "max_decoder_steps": 60,
                },
            }
        ),
        encoding="utf-8",
    )
    voice_dir = tmp_path / "voices" / "en-us" / "trained_t2-tacotron2"
    train_main(
        [
            "--family", "tacotron2",
            "--metadata", str(tiny_dataset / "metadata.csv"),
            "--wav-dir", str(tiny_dataset / "wavs"),
            "--output-dir", str(voice_dir),
            "--config", str(cfg_path),
            "--phonemes", str(tiny_dataset / "phonemes.txt"),
            "--batch-size", "4",
            "--epochs", "1",
            "--max-id-len", "64",
            "--max-mel-len", "128",
            "--checkpoint-every", "100",
        ]
    )
    assert (voice_dir / "generator.npz").is_file()
    written = json.loads((voice_dir / "config.json").read_text())
    assert written["model"]["num_symbols"] > 0  # auto-sized + persisted

    import larynx_tpu

    larynx_tpu._TTS_MODEL_CACHE.clear()
    model = larynx_tpu.get_tts_model(
        "en-us_trained_t2-tacotron2",
        custom_voices_dir=tmp_path / "voices",
        no_download=True,
    )
    try:
        mels = model.phonemes_to_mels(
            np.asarray([3, 5, 9, 3, 2], dtype=np.int64)
        )
        assert mels.shape[1] == 80
        assert np.isfinite(mels).all()
    finally:
        larynx_tpu._TTS_MODEL_CACHE.clear()


def test_train_cli_end_to_end(tiny_dataset, tmp_path):
    from larynx_tpu.train import main as train_main

    voice_dir = tmp_path / "voices" / "en-us" / "trained_voice-glow_tts"
    train_main(
        [
            "--metadata", str(tiny_dataset / "metadata.csv"),
            "--wav-dir", str(tiny_dataset / "wavs"),
            "--output-dir", str(voice_dir),
            "--config", str(tiny_dataset / "config.json"),
            "--phonemes", str(tiny_dataset / "phonemes.txt"),
            "--batch-size", "4",
            "--epochs", "2",
            "--max-id-len", "64",
            "--max-mel-len", "128",
            "--checkpoint-every", "100",
        ]
    )
    assert (voice_dir / "generator.npz").is_file()
    assert (voice_dir / "config.json").is_file()
    assert (voice_dir / "phonemes.txt").is_file()

    # the trained dir loads through the standard inference path
    import larynx_tpu

    larynx_tpu._TTS_MODEL_CACHE.clear()
    model = larynx_tpu.get_tts_model(
        "en-us_trained_voice-glow_tts",
        custom_voices_dir=tmp_path / "voices",
        no_download=True,
    )
    assert model is not None
    mels = model.phonemes_to_mels(np.asarray([3, 5, 9, 3, 2], dtype=np.int64))
    assert mels.shape[1] == 80
    assert np.isfinite(mels).all()
