"""Pallas kernel correctness tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from larynx_tpu.models.hifi_gan.model import _resblock1
from larynx_tpu.ops.mrf_block import fused_mrf, pack_mrf_weights


def _random_stage(rng, c, kernel_sizes=(3, 7, 11), dilations=((1, 3, 5),) * 3):
    resblocks = []
    for k, dils in zip(kernel_sizes, dilations):
        block = {
            "convs1": [
                {
                    "w": rng.standard_normal((k, c, c)).astype(np.float32) * 0.05,
                    "b": rng.standard_normal(c).astype(np.float32) * 0.01,
                }
                for _ in dils
            ],
            "convs2": [
                {
                    "w": rng.standard_normal((k, c, c)).astype(np.float32) * 0.05,
                    "b": rng.standard_normal(c).astype(np.float32) * 0.01,
                }
                for _ in dils
            ],
        }
        resblocks.append(block)
    return resblocks


def _xla_reference(resblocks, x, kernel_sizes, dilations):
    acc = None
    for block, k, dils in zip(resblocks, kernel_sizes, dilations):
        y = _resblock1(block, x, k, dils)
        acc = y if acc is None else acc + y
    return acc / len(resblocks)


@pytest.mark.parametrize("channels", [32, 128])
def test_fused_mrf_matches_xla(channels):
    rng = np.random.default_rng(0)
    kernel_sizes = (3, 7, 11)
    dilations = ((1, 3, 5),) * 3
    resblocks = _random_stage(rng, channels, kernel_sizes, dilations)
    weights = pack_mrf_weights(resblocks)

    # T deliberately not a multiple of the tile; exercises padding + edges
    x = rng.standard_normal((2, 300, channels)).astype(np.float32)

    ref = np.asarray(
        _xla_reference(resblocks, jnp.asarray(x), kernel_sizes, dilations)
    )
    out = np.asarray(
        fused_mrf(
            jnp.asarray(x),
            weights,
            kernel_sizes=kernel_sizes,
            dilations_per_block=dilations,
            tile=128,
            interpret=True,
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fused_mrf_small_resblock2_style():
    """Two-kernel ResBlock1 configuration with unusual dilations."""
    rng = np.random.default_rng(1)
    kernel_sizes = (3, 5)
    dilations = ((1, 2), (2, 6))
    resblocks = _random_stage(rng, 32, kernel_sizes, dilations)
    weights = pack_mrf_weights(resblocks)
    x = rng.standard_normal((1, 200, 32)).astype(np.float32)

    ref = np.asarray(
        _xla_reference(resblocks, jnp.asarray(x), kernel_sizes, dilations)
    )
    out = np.asarray(
        fused_mrf(
            jnp.asarray(x),
            weights,
            kernel_sizes=kernel_sizes,
            dilations_per_block=dilations,
            tile=64,
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fused_mrf_resblock2():
    """True ResBlock2 topology (vctk_small: single dilated conv per unit)."""
    from larynx_tpu.models.hifi_gan.model import _resblock2

    rng = np.random.default_rng(2)
    kernel_sizes = (3, 5, 7)
    dilations = ((1, 2), (2, 6), (3, 12))
    resblocks = []
    c = 32
    for k, dils in zip(kernel_sizes, dilations):
        resblocks.append(
            {
                "convs": [
                    {
                        "w": rng.standard_normal((k, c, c)).astype(np.float32)
                        * 0.05,
                        "b": rng.standard_normal(c).astype(np.float32) * 0.01,
                    }
                    for _ in dils
                ]
            }
        )
    weights = pack_mrf_weights(resblocks)
    x = rng.standard_normal((2, 260, c)).astype(np.float32)

    acc = None
    for block, k, dils in zip(resblocks, kernel_sizes, dilations):
        y = _resblock2(block, jnp.asarray(x), k, dils)
        acc = y if acc is None else acc + y
    ref = np.asarray(acc / len(resblocks))

    out = np.asarray(
        fused_mrf(
            jnp.asarray(x),
            weights,
            kernel_sizes=kernel_sizes,
            dilations_per_block=dilations,
            tile=128,
            convs_per_unit=1,
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
