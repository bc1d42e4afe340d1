"""Multi-speaker GlowTTS parity vs the reference torch model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from larynx_tpu.convert.torch_import import glow_tts_params_from_state_dict
from larynx_tpu.models.glow_tts import GlowTTSConfig, encode, expand_and_decode
from larynx_tpu.models.glow_tts.model import speaker_embedding

CFG = GlowTTSConfig(
    num_symbols=46,
    hidden_channels=64,
    filter_channels=128,
    filter_channels_dp=64,
    n_layers_enc=2,
    n_blocks_dec=2,
    n_block_layers=2,
    n_speakers=4,
    gin_channels=32,
    window_size=4,
    mean_only=True,
    prenet=True,
)


def test_multispeaker_full_forward_parity(reference_torch):
    import torch

    from glow_tts.models import FlowGenerator

    torch.manual_seed(5)
    model = FlowGenerator(
        n_vocab=CFG.num_symbols,
        hidden_channels=CFG.hidden_channels,
        filter_channels=CFG.filter_channels,
        filter_channels_dp=CFG.filter_channels_dp,
        out_channels=CFG.mel_channels,
        n_heads=CFG.n_heads,
        n_layers_enc=CFG.n_layers_enc,
        n_blocks_dec=CFG.n_blocks_dec,
        kernel_size_dec=CFG.kernel_size_dec,
        dilation_rate=CFG.dilation_rate,
        n_block_layers=CFG.n_block_layers,
        n_split=CFG.n_split,
        n_sqz=CFG.n_sqz,
        window_size=CFG.window_size,
        mean_only=CFG.mean_only,
        prenet=CFG.prenet,
        n_speakers=CFG.n_speakers,
        gin_channels=CFG.gin_channels,
    )
    model.eval()
    model.decoder.store_inverse()

    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = glow_tts_params_from_state_dict(sd, CFG)
    assert "emb_g" in params

    rng = np.random.default_rng(6)
    ids = rng.integers(1, CFG.num_symbols, size=(2, 9)).astype(np.int32)
    lengths = np.array([9, 6], dtype=np.int32)
    speaker = np.array([2, 1], dtype=np.int32)

    with torch.no_grad():
        (mel_t, *_), _, _ = model(
            torch.from_numpy(ids).long(),
            torch.from_numpy(lengths).long(),
            g=torch.from_numpy(speaker).long(),
            noise_scale=0.0,
            length_scale=1.0,
        )

    g = speaker_embedding(params, jnp.asarray(speaker))
    x_m, x_logs, _logw, w_ceil, y_lengths, _mask = encode(
        params, CFG, jnp.asarray(ids), jnp.asarray(lengths), g=g
    )
    mel, _ = expand_and_decode(
        params, CFG, x_m, x_logs, w_ceil, y_lengths,
        jax.random.PRNGKey(0),
        mel_max_length=int(mel_t.shape[-1]),
        noise_scale=0.0,
        g=g,
    )
    np.testing.assert_allclose(
        np.asarray(mel).transpose(0, 2, 1), mel_t.numpy(), rtol=1e-3, atol=5e-4
    )
