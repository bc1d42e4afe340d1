"""Mixed-precision serving: f32 flows + bf16 vocoder.

The production default on TPU backends runs the HiFi-GAN stack in
bfloat16 (2x MXU rate, half the HBM traffic) while the flow decoder stays
float32.  These tests pin (a) the default-selection logic and (b) that the
bf16 waveform is audibly identical to the f32 one (high correlation, no
level shift) — the quantitative backing for making it the default.
"""

import numpy as np
import jax
import pytest

from larynx_tpu.audio import AudioSettings
from larynx_tpu.models.glow_tts import GlowTTSConfig
from larynx_tpu.models.glow_tts.model import init_params as glow_init
from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan.model import init_params as hifi_init
from larynx_tpu.runtime.engine import SynthesisEngine, default_vocoder_half


@pytest.fixture(scope="module")
def engines():
    glow_cfg = GlowTTSConfig(
        num_symbols=48,
        hidden_channels=96,
        filter_channels=192,
        filter_channels_dp=64,
        n_layers_enc=2,
        n_blocks_dec=4,
    )
    voc_cfg = HiFiGanConfig(upsample_initial_channel=64)
    settings = AudioSettings(
        signal_norm=True, max_norm=1.0, symmetric_norm=True, clip_norm=True
    )
    key = jax.random.PRNGKey(0)
    glow_params = glow_init(key, glow_cfg)
    voc_params = hifi_init(jax.random.fold_in(key, 1), voc_cfg)

    def build(**kw):
        return SynthesisEngine(
            glow_params, glow_cfg, settings,
            vocoder_kind="hifi_gan",
            vocoder_params=voc_params,
            vocoder_cfg=voc_cfg,
            seed=7,
            use_pallas=False,
            **kw,
        )

    return build(vocoder_half=False), build(vocoder_half=True)


def test_default_selection(monkeypatch):
    # CPU backend (forced in conftest) -> f32 unless asked for
    assert default_vocoder_half() is False
    monkeypatch.setenv("LARYNX_TPU_VOCODER_PRECISION", "bf16")
    assert default_vocoder_half() is True
    monkeypatch.setenv("LARYNX_TPU_VOCODER_PRECISION", "f32")
    assert default_vocoder_half() is False


def test_flags_compose(engines):
    f32_engine, bf16_engine = engines
    assert f32_engine.voc_dtype == np.float32
    assert f32_engine.dtype == np.float32  # flows stay f32 in both
    import jax.numpy as jnp

    assert bf16_engine.voc_dtype == jnp.bfloat16
    assert bf16_engine.dtype == np.float32


def test_bf16_vocoder_audibly_identical(engines):
    f32_engine, bf16_engine = engines
    rng = np.random.default_rng(3)
    ids = [rng.integers(1, 48, size=24).astype(np.int64) for _ in range(2)]

    a32 = f32_engine.synthesize_batch(ids, seed=7)
    a16 = bf16_engine.synthesize_batch(ids, seed=7)

    for x, y in zip(a32, a16):
        assert x.shape == y.shape
        xf = x.astype(np.float64)
        yf = y.astype(np.float64)
        corr = np.corrcoef(xf, yf)[0, 1]
        assert corr > 0.999, corr
        # same level after the shared peak normalization
        assert abs(np.sqrt(np.mean(xf**2)) - np.sqrt(np.mean(yf**2))) < (
            0.01 * 32767
        )
