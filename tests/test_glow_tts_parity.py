"""Numerical parity: larynx_tpu GlowTTS vs the reference PyTorch model.

The reference model (random-initialized, seeded) is the oracle; its weights
are converted through larynx_tpu.convert and outputs compared block by
block.  With noise_scale=0 the whole model is deterministic, so full
end-to-end equality is checked too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from larynx_tpu.convert.torch_import import glow_tts_params_from_state_dict
from larynx_tpu.models.glow_tts import GlowTTSConfig, encode, expand_and_decode
from larynx_tpu.models.glow_tts import flows
from larynx_tpu.models.nn import sequence_mask

CFG = GlowTTSConfig(
    num_symbols=46,
    hidden_channels=192,
    filter_channels=768,
    filter_channels_dp=256,
    mel_channels=80,
    kernel_size=3,
    n_heads=2,
    n_layers_enc=6,
    n_blocks_dec=12,
    kernel_size_dec=5,
    dilation_rate=1,
    n_block_layers=4,
    n_split=4,
    n_sqz=2,
    window_size=4,
    mean_only=True,
    prenet=True,
)


@pytest.fixture(scope="module")
def torch_model(reference_torch):
    import torch

    from glow_tts.models import FlowGenerator

    torch.manual_seed(1234)
    model = FlowGenerator(
        n_vocab=CFG.num_symbols,
        hidden_channels=CFG.hidden_channels,
        filter_channels=CFG.filter_channels,
        filter_channels_dp=CFG.filter_channels_dp,
        out_channels=CFG.mel_channels,
        kernel_size=CFG.kernel_size,
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
    )
    model.eval()
    model.decoder.store_inverse()
    return model


@pytest.fixture(scope="module")
def jax_params(torch_model):
    sd = {
        k: v.detach().float().numpy()
        for k, v in torch_model.state_dict().items()
    }
    return glow_tts_params_from_state_dict(sd, CFG)


def _inputs():
    rng = np.random.default_rng(7)
    ids = rng.integers(1, CFG.num_symbols, size=(2, 11)).astype(np.int32)
    lengths = np.array([11, 7], dtype=np.int32)
    ids[1, 7:] = 0  # padded region
    return ids, lengths


def test_encoder_parity(torch_model, jax_params):
    import torch

    ids, lengths = _inputs()
    with torch.no_grad():
        x_m_t, x_logs_t, logw_t, mask_t = torch_model.encoder(
            torch.from_numpy(ids).long(), torch.from_numpy(lengths).long()
        )

    x_m, x_logs, logw, w_ceil, y_lengths, mask = encode(
        jax_params, CFG, jnp.asarray(ids), jnp.asarray(lengths)
    )

    np.testing.assert_allclose(
        np.asarray(mask), mask_t.numpy()[:, 0, :], atol=0
    )
    np.testing.assert_allclose(
        np.asarray(x_m).transpose(0, 2, 1),
        x_m_t.numpy(),
        rtol=1e-4,
        atol=2e-4,
    )
    # durations: w_ceil = ceil(exp(logw) * mask)
    w_ceil_t = np.ceil(np.exp(logw_t.numpy()) * mask_t.numpy())[:, 0, :]
    np.testing.assert_allclose(np.asarray(w_ceil), w_ceil_t, atol=1e-5)


def test_decoder_reverse_parity(torch_model, jax_params):
    import torch

    rng = np.random.default_rng(8)
    m = 24
    z = rng.standard_normal((2, m, CFG.mel_channels)).astype(np.float32)
    y_lengths = np.array([24, 18], dtype=np.int32)
    z_mask = np.asarray(sequence_mask(jnp.asarray(y_lengths), m))
    z = z * z_mask[..., None]

    with torch.no_grad():
        mel_t, _ = torch_model.decoder(
            torch.from_numpy(z.transpose(0, 2, 1)),
            torch.from_numpy(z_mask[:, None, :]),
            reverse=True,
        )

    mel, _ = flows.decoder(
        jax_params["decoder"],
        jnp.asarray(z),
        jnp.asarray(z_mask),
        CFG,
        reverse=True,
    )
    np.testing.assert_allclose(
        np.asarray(mel).transpose(0, 2, 1), mel_t.numpy(), rtol=1e-3, atol=1e-4
    )


def test_decoder_forward_logdet_parity(torch_model, jax_params):
    """Forward (training) direction including the log-determinant."""
    import torch

    rng = np.random.default_rng(9)
    m = 16
    y = rng.standard_normal((2, m, CFG.mel_channels)).astype(np.float32)
    y_lengths = np.array([16, 12], dtype=np.int32)
    y_mask = np.asarray(sequence_mask(jnp.asarray(y_lengths), m))
    y = y * y_mask[..., None]

    with torch.no_grad():
        z_t, logdet_t = torch_model.decoder(
            torch.from_numpy(y.transpose(0, 2, 1)),
            torch.from_numpy(y_mask[:, None, :]),
            reverse=False,
        )

    z, logdet = flows.decoder(
        jax_params["decoder"],
        jnp.asarray(y),
        jnp.asarray(y_mask),
        CFG,
        reverse=False,
    )
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 2, 1), z_t.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logdet), logdet_t.numpy(), rtol=1e-4, atol=1e-3
    )


def test_full_forward_parity_zero_noise(torch_model, jax_params):
    """End-to-end: ids -> mel, deterministic with noise_scale=0."""
    import torch

    ids, lengths = _inputs()
    with torch.no_grad():
        (mel_t, *_), _, (attn_t, *_) = torch_model(
            torch.from_numpy(ids).long(),
            torch.from_numpy(lengths).long(),
            noise_scale=0.0,
            length_scale=1.0,
        )

    x_m, x_logs, logw, w_ceil, y_lengths, x_mask = encode(
        jax_params, CFG, jnp.asarray(ids), jnp.asarray(lengths)
    )
    m_bucket = int(mel_t.shape[-1])
    mel, z_mask = expand_and_decode(
        jax_params,
        CFG,
        x_m,
        x_logs,
        w_ceil,
        y_lengths,
        jax.random.PRNGKey(0),
        mel_max_length=m_bucket,
        noise_scale=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(mel).transpose(0, 2, 1),
        mel_t.numpy(),
        rtol=1e-3,
        atol=2e-4,
    )
