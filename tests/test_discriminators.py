"""HiFi-GAN discriminator + GAN loss parity vs the reference torch models."""

import numpy as np
import pytest

import jax.numpy as jnp

from larynx_tpu.models.hifi_gan import discriminators as disc


def _harvest_conv2d(module):
    import numpy as np

    w = module.weight.detach().numpy()
    return {
        "w": np.transpose(w, (2, 3, 1, 0)),
        "b": module.bias.detach().numpy(),
    }


def _harvest_conv1d(module):
    import numpy as np

    w = module.weight.detach().numpy()
    return {
        "w": np.transpose(w, (2, 1, 0)),
        "b": module.bias.detach().numpy(),
    }


@pytest.fixture(scope="module")
def torch_discriminators(reference_torch):
    import torch

    from hifi_gan.models import MultiPeriodDiscriminator, MultiScaleDiscriminator

    torch.manual_seed(11)
    mpd = MultiPeriodDiscriminator().eval()
    msd = MultiScaleDiscriminator().eval()
    # one forward materializes the parametrized (weight-norm/spectral-norm)
    # effective weights on the modules
    with torch.no_grad():
        x = torch.zeros(1, 1, 2048)
        mpd(x, x)
        msd(x, x)
    return mpd, msd


@pytest.fixture(scope="module")
def jax_disc_params(torch_discriminators):
    mpd, msd = torch_discriminators
    periods = []
    for d in mpd.discriminators:
        periods.append(
            {
                "convs": [_harvest_conv2d(c) for c in d.convs],
                "post": _harvest_conv2d(d.conv_post),
            }
        )
    scales = []
    for d in msd.discriminators:
        scales.append(
            {
                "convs": [_harvest_conv1d(c) for c in d.convs],
                "post": _harvest_conv1d(d.conv_post),
            }
        )
    return {"periods": periods, "scales": scales}


def test_multi_period_parity(torch_discriminators, jax_disc_params):
    import torch

    mpd, _ = torch_discriminators
    rng = np.random.default_rng(0)
    real = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    fake = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1

    with torch.no_grad():
        sr_t, sg_t, fr_t, fg_t = mpd(
            torch.from_numpy(real[:, None, :]), torch.from_numpy(fake[:, None, :])
        )
    srs, sgs, frs, fgs = disc.multi_period(
        jax_disc_params, jnp.asarray(real), jnp.asarray(fake)
    )
    for ours, theirs in zip(srs, sr_t):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-4
        )
    # feature maps: compare the last fmap of each discriminator
    for fmap_ours, fmap_theirs in zip(fgs, fg_t):
        ours_last = np.asarray(fmap_ours[-1])[..., 0]  # NHWC -> NHW
        theirs_last = fmap_theirs[-1].numpy()[:, 0]  # NCHW -> NHW
        np.testing.assert_allclose(ours_last, theirs_last, rtol=1e-3, atol=1e-4)


def test_multi_scale_parity(torch_discriminators, jax_disc_params):
    import torch

    _, msd = torch_discriminators
    rng = np.random.default_rng(1)
    real = rng.standard_normal((1, 4096)).astype(np.float32) * 0.1
    fake = rng.standard_normal((1, 4096)).astype(np.float32) * 0.1

    with torch.no_grad():
        sr_t, sg_t, *_ = msd(
            torch.from_numpy(real[:, None, :]), torch.from_numpy(fake[:, None, :])
        )
    srs, sgs, _, _ = disc.multi_scale(
        jax_disc_params, jnp.asarray(real), jnp.asarray(fake)
    )
    for ours, theirs in zip(srs, sr_t):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=2e-4
        )


def test_gan_losses_match_reference(reference_torch):
    import torch

    from hifi_gan.models import (
        discriminator_loss as ref_d,
        feature_loss as ref_f,
        generator_loss as ref_g,
    )

    rng = np.random.default_rng(2)
    scores_r = [rng.standard_normal((2, 50)).astype(np.float32) for _ in range(3)]
    scores_g = [rng.standard_normal((2, 50)).astype(np.float32) for _ in range(3)]
    fmaps_r = [[rng.standard_normal((2, 8, 4)).astype(np.float32)] for _ in range(3)]
    fmaps_g = [[rng.standard_normal((2, 8, 4)).astype(np.float32)] for _ in range(3)]

    t = torch.from_numpy
    ref_dl, _, _ = ref_d([t(x) for x in scores_r], [t(x) for x in scores_g])
    ref_gl, _ = ref_g([t(x) for x in scores_g])
    ref_fl = ref_f(
        [[t(x) for x in f] for f in fmaps_r], [[t(x) for x in f] for f in fmaps_g]
    )

    assert abs(float(disc.discriminator_loss(scores_r, scores_g)) - float(ref_dl)) < 1e-4
    assert abs(float(disc.generator_loss(scores_g)) - float(ref_gl)) < 1e-4
    assert abs(float(disc.feature_loss(fmaps_r, fmaps_g)) - float(ref_fl)) < 1e-4
