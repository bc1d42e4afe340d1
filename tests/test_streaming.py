"""Chunked streaming synthesis (engine.synthesize_stream).

Exactness contract: chunked emission must equal the single-window run
bit-for-bit (the receptive-field halo + edge-clamped window guarantee
it), and total duration must match batch synthesis.
"""

import numpy as np
import pytest

import jax

from larynx_tpu.audio import AudioSettings
from larynx_tpu.models.glow_tts import GlowTTSConfig
from larynx_tpu.models.glow_tts.model import init_params as glow_init
from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan.model import init_params as hifi_init
from larynx_tpu.runtime.engine import SynthesisEngine, stream_halo_frames


@pytest.fixture(scope="module")
def engine():
    glow_cfg = GlowTTSConfig(
        hidden_channels=64,
        filter_channels=128,
        filter_channels_dp=64,
        n_layers_enc=2,
        n_blocks_dec=2,
        n_block_layers=2,
    )
    hifi_cfg = HiFiGanConfig(
        resblock="2",
        upsample_initial_channel=64,
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (2, 6)),
    )
    key = jax.random.PRNGKey(0)
    settings = AudioSettings(
        signal_norm=True, max_norm=1.0, symmetric_norm=True, clip_norm=True
    )
    return SynthesisEngine(
        glow_init(key, glow_cfg),
        glow_cfg,
        settings,
        vocoder_kind="hifi_gan",
        vocoder_params=hifi_init(jax.random.fold_in(key, 1), hifi_cfg),
        vocoder_cfg=hifi_cfg,
        seed=7,
    )


def test_stream_halo_is_positive_and_modest():
    h = stream_halo_frames(HiFiGanConfig())  # universal_large geometry
    assert 8 <= h <= 32, h


@pytest.mark.parametrize("denoiser_strength", [0.0, 0.005])
def test_chunked_equals_single_window(engine, denoiser_strength):
    ids = np.arange(1, 40, dtype=np.int64)
    chunks = list(
        engine.synthesize_stream(
            ids, seed=5, chunk_frames=16, denoiser_strength=denoiser_strength
        )
    )
    whole = list(
        engine.synthesize_stream(
            ids, seed=5, chunk_frames=10**6,
            denoiser_strength=denoiser_strength,
        )
    )
    assert len(chunks) > 2 and len(whole) == 1
    streamed = np.concatenate(chunks)
    reference = whole[0]
    n = min(len(streamed), len(reference))
    assert n > 1000
    # identical math, but the chunked and single-window programs fuse
    # differently in XLA, so a handful of samples may round to the
    # neighboring int16 step
    diff = np.abs(streamed[:n].astype(np.int32) - reference[:n].astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert np.mean(diff != 0) < 1e-3, np.mean(diff != 0)
    assert abs(len(streamed) - len(reference)) <= engine.upsample * 16


def test_stream_duration_matches_batch(engine):
    ids = np.arange(1, 30, dtype=np.int64)
    streamed = np.concatenate(
        list(engine.synthesize_stream(ids, seed=3, chunk_frames=16))
    )
    batch = engine.synthesize_batch([ids], seed=3)[0]
    assert streamed.dtype == np.int16
    assert len(streamed) == len(batch)
    # same waveform up to the batch path's per-utterance peak normalization
    a = streamed.astype(np.float64)
    b = batch.astype(np.float64)
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert corr > 0.9999, corr


def test_stream_requires_hifi_gan_raises_value_error():
    """Non-HiFi engines must reject streaming with a real exception (the
    server maps it to an error response; a bare assert would vanish
    under python -O)."""
    from larynx_tpu.audio import AudioSettings
    from larynx_tpu.models.glow_tts import GlowTTSConfig
    from larynx_tpu.models.glow_tts.model import init_params as glow_init
    from larynx_tpu.runtime.engine import SynthesisEngine

    glow_cfg = GlowTTSConfig(
        hidden_channels=64, filter_channels=128, filter_channels_dp=64,
        n_layers_enc=2, n_blocks_dec=2, n_block_layers=2,
    )
    eng = SynthesisEngine(
        glow_init(jax.random.PRNGKey(0), glow_cfg), glow_cfg,
        AudioSettings(signal_norm=True, max_norm=1.0,
                      symmetric_norm=True, clip_norm=True),
        vocoder_kind="griffin_lim", seed=7, griffin_lim_iters=2,
    )
    with pytest.raises(ValueError, match="HiFi-GAN"):
        next(eng.synthesize_stream(np.arange(1, 10, dtype=np.int64)))
