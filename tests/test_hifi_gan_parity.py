"""Numerical parity: larynx_tpu HiFi-GAN vs the reference PyTorch generator."""

import numpy as np
import pytest

import jax.numpy as jnp

from larynx_tpu.convert.torch_import import hifi_gan_params_from_state_dict
from larynx_tpu.models.hifi_gan import HiFiGanConfig, generator


def _make_torch_generator(reference_torch, cfg: HiFiGanConfig):
    import torch

    from hifi_gan.config import TrainingConfig
    from hifi_gan.models import Generator

    tc = TrainingConfig()
    tc.model.resblock = cfg.resblock
    tc.model.upsample_rates = list(cfg.upsample_rates)
    tc.model.upsample_kernel_sizes = list(cfg.upsample_kernel_sizes)
    tc.model.upsample_initial_channel = cfg.upsample_initial_channel
    tc.model.resblock_kernel_sizes = list(cfg.resblock_kernel_sizes)
    tc.model.resblock_dilation_sizes = [list(d) for d in cfg.resblock_dilation_sizes]

    torch.manual_seed(42)
    model = Generator(tc)
    model.eval()
    model.remove_weight_norm()
    return model


# Shrunk geometries (same structure, fewer channels) keep the test fast;
# the vctk_small case is the real low-quality topology.
CASES = {
    "resblock1": HiFiGanConfig(
        resblock="1",
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=64,
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    ),
    "vctk_small": HiFiGanConfig(
        resblock="2",
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_generator_parity(reference_torch, case):
    import torch

    cfg = CASES[case]
    model = _make_torch_generator(reference_torch, cfg)
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = hifi_gan_params_from_state_dict(
        sd,
        cfg.upsample_rates,
        cfg.resblock_kernel_sizes,
        resblock=cfg.resblock,
    )

    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, cfg.num_mels, 17)).astype(np.float32)

    with torch.no_grad():
        audio_t = model(torch.from_numpy(mel)).numpy()  # [B, 1, T*256]

    audio = np.asarray(
        generator(params, cfg, jnp.asarray(mel.transpose(0, 2, 1)))
    )
    assert audio.shape == (2, 17 * cfg.total_upsample)
    np.testing.assert_allclose(
        audio, audio_t[:, 0, :], rtol=1e-3, atol=1e-4
    )


def test_denoiser_matches_reference(reference_dir):
    """Spectral-subtraction denoiser vs the reference numpy implementation."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_audio", reference_dir / "larynx" / "audio.py"
    )
    ref_audio = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_audio)

    from larynx_tpu.models.hifi_gan import denoiser

    rng = np.random.default_rng(4)
    bias_audio = rng.standard_normal((1, 23552)).astype(np.float32) * 0.01
    audio = rng.standard_normal((1, 40960)).astype(np.float32)

    # reference path (larynx/hifi_gan.py:171-203)
    bias_spec_ref, _ = ref_audio.transform(bias_audio)
    bias_spec_ref = bias_spec_ref[:, :, 0][:, :, None]
    spec_ref, angles_ref = ref_audio.transform(audio)
    den_ref = np.clip(spec_ref - bias_spec_ref * 0.005, a_min=0.0, a_max=None)
    out_ref = ref_audio.inverse(den_ref, angles_ref)

    bias_spec = denoiser.compute_bias_spec(jnp.asarray(bias_audio))
    np.testing.assert_allclose(
        np.asarray(bias_spec), bias_spec_ref, rtol=1e-3, atol=1e-4
    )
    out = denoiser.denoise(jnp.asarray(audio), bias_spec, 0.005)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-3, atol=1e-3)
