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


@pytest.mark.parametrize("channels", [8, 16, 32, 64, 128])
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


# -----------------------------------------------------------------------------
# Per-chain fused path for wide stages (C > 128)


def test_fused_mrf_single_chain_wide():
    """One chain at C=256 (the per-chain path generator uses when the
    whole section's weights overflow VMEM but each chain's fit)."""
    rng = np.random.default_rng(3)
    c = 256
    resblocks = _random_stage(rng, c, kernel_sizes=(7,), dilations=((1, 3, 5),))
    x = rng.standard_normal((1, 200, c)).astype(np.float32)

    ref = np.asarray(_resblock1(resblocks[0], jnp.asarray(x), 7, (1, 3, 5)))
    out = np.asarray(
        fused_mrf(
            jnp.asarray(x),
            pack_mrf_weights(resblocks),
            kernel_sizes=(7,),
            dilations_per_block=((1, 3, 5),),
            tile=64,
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


# -----------------------------------------------------------------------------
# Lane-dense (time-packed) vocoder path


def test_conv_transpose_packed_matches_dense():
    from larynx_tpu.models.nn import conv_transpose1d
    from larynx_tpu.ops.packed_ups import conv_transpose_packed

    rng = np.random.default_rng(0)
    for ci, u, k, co, p_in in (
        (128, 8, 16, 64, 1),
        (64, 2, 4, 32, 2),
        (64, 4, 8, 32, 2),
        (32, 2, 4, 16, 4),
    ):
        t = 64
        x = rng.standard_normal((2, t, ci)).astype(np.float32)
        w = (rng.standard_normal((k, ci, co)) * 0.1).astype(np.float32)
        b = (rng.standard_normal(co) * 0.1).astype(np.float32)
        ref = conv_transpose1d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            stride=u, padding=(k - u) // 2,
        )
        xp = jnp.asarray(x).reshape(2, t // p_in, p_in * ci)
        wide = conv_transpose_packed(
            xp, jnp.asarray(w), jnp.asarray(b),
            stride=u, padding=(k - u) // 2, c_in=ci,
        )
        out = wide.reshape(2, t * u, co)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_conv_to_time_major_matches_dense():
    from larynx_tpu.models.nn import conv1d
    from larynx_tpu.ops.packed_ups import conv_to_time_major

    rng = np.random.default_rng(1)
    for ci, p in ((32, 4), (16, 8), (8, 16)):
        t, k = 512, 7
        x = rng.standard_normal((2, t, ci)).astype(np.float32)
        w = (rng.standard_normal((k, ci, 1)) * 0.1).astype(np.float32)
        b = (rng.standard_normal(1) * 0.1).astype(np.float32)
        ref = conv1d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), padding=(k - 1) // 2
        )[..., 0]
        out = conv_to_time_major(
            jnp.asarray(x).reshape(2, t // p, p * ci),
            jnp.asarray(w), jnp.asarray(b), c_in=ci,
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("tier", ["high", "medium", "low"])
def test_packed_generator_matches_xla(tier):
    """The fully lane-dense generator path == the plain XLA path, for all
    three released vocoder geometries."""
    from larynx_tpu.models.hifi_gan import HiFiGanConfig
    from larynx_tpu.models.hifi_gan import model as hifi

    geometry = {
        "high": dict(
            resblock="1", upsample_initial_channel=512,
            upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
            resblock_kernel_sizes=(3, 7, 11),
            resblock_dilation_sizes=((1, 3, 5),) * 3,
        ),
        "medium": dict(
            resblock="1", upsample_initial_channel=128,
            upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
            resblock_kernel_sizes=(3, 7, 11),
            resblock_dilation_sizes=((1, 3, 5),) * 3,
        ),
        "low": dict(
            resblock="2", upsample_initial_channel=256,
            upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
            resblock_kernel_sizes=(3, 5, 7),
            resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
        ),
    }[tier]
    cfg = HiFiGanConfig(**geometry)
    params = hifi.init_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 80), jnp.float32)
    ref = hifi.generator(params, cfg, mel, use_pallas=False)
    out = hifi.generator(
        params, cfg, mel, use_pallas=True, pallas_interpret=True
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_generator_unpacks_when_alignment_breaks():
    """A geometry whose odd upsample rate breaks 128-lane alignment
    mid-stack must fall back to the dense layout (free reshape), not
    crash (regression: the packed path asserted)."""
    from larynx_tpu.models.hifi_gan import HiFiGanConfig
    from larynx_tpu.models.hifi_gan import model as hifi

    cfg = HiFiGanConfig(
        resblock="2", upsample_initial_channel=32,
        # stages pack at c=16 then c=8; u=3 gives pack*u*c_out = 192,
        # not lane-aligned -> unpack; final stage stays dense
        upsample_rates=(8, 8, 3, 2), upsample_kernel_sizes=(16, 16, 7, 4),
        resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=((1, 2), (2, 6)),
    )
    params = hifi.init_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 80), jnp.float32)
    ref = hifi.generator(params, cfg, mel, use_pallas=False)
    out = hifi.generator(
        params, cfg, mel, use_pallas=True, pallas_interpret=True
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_auto_tile_sublane_aligned():
    """The auto tile must be a multiple of 8 rows for every lane width —
    interpret mode cannot catch the Mosaic sublane violation (real
    hardware crashes on tile=341 at c=384), so pin the formula itself."""
    from larynx_tpu.ops.mrf_block import auto_tile

    for c in (128, 256, 384, 512, 640, 1024):
        tile = auto_tile(c)
        assert tile % 8 == 0 and tile >= 8, (c, tile)
    assert auto_tile(384) == 336  # the 341 regression case


def test_fused_mrf_pad_to_384_tile_aligned():
    """C in (256, 384] pads to 384 lanes; the auto tile must stay a
    multiple of 8 rows (the VMEM-budget formula would otherwise pick 341,
    violating Mosaic's sublane tiling on real hardware)."""
    rng = np.random.default_rng(7)
    kernel_sizes = (3,)
    dilations = ((1, 3),)
    resblocks = _random_stage(rng, 300, kernel_sizes, dilations)
    weights = pack_mrf_weights(resblocks)

    x = rng.standard_normal((1, 700, 300)).astype(np.float32)
    ref = np.asarray(
        _xla_reference(resblocks, jnp.asarray(x), kernel_sizes, dilations)
    )
    out = np.asarray(
        fused_mrf(
            jnp.asarray(x),
            weights,
            kernel_sizes=kernel_sizes,
            dilations_per_block=dilations,
            interpret=True,  # no explicit tile: exercises the auto choice
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dilation", [1, 4, 128])
@pytest.mark.parametrize("rs_out", [512, 256])
def test_fused_wn_layer_matches_xla(dilation, rs_out):
    """ops/wn_layer.py (fused WaveGlow WN layer) must match the XLA
    composition in models/waveglow/model.py::_wn for one layer —
    interpret mode on CPU; the TPU lowering shares the kernel body."""
    from larynx_tpu.models.nn import conv1d, matmul1x1
    from larynx_tpu.ops.wn_layer import fused_wn_layer

    key = jax.random.PRNGKey(17 + dilation)
    B, T, CH, CC = 2, 700, 256, 640
    ks = jax.random.split(key, 8)
    h = jax.random.normal(ks[0], (B, T, CH))
    cond = jax.random.normal(ks[1], (B, T, CC))
    w_in = jax.random.normal(ks[2], (3, CH, 2 * CH)) * 0.05
    b_in = jax.random.normal(ks[3], (2 * CH,)) * 0.01
    w_cond = jax.random.normal(ks[4], (CC, 2 * CH)) * 0.05
    b_cond = jax.random.normal(ks[5], (2 * CH,)) * 0.01
    w_rs = jax.random.normal(ks[6], (CH, rs_out)) * 0.05
    b_rs = jax.random.normal(ks[7], (rs_out,)) * 0.01

    a = conv1d(h, w_in, b_in, dilation=dilation) + matmul1x1(
        cond, w_cond, b_cond
    )
    acts = jnp.tanh(a[..., :CH]) * jax.nn.sigmoid(a[..., CH:])
    ref = matmul1x1(acts, w_rs, b_rs)

    got = fused_wn_layer(
        h, cond, w_in, b_in, w_cond, b_cond, w_rs, b_rs,
        dilation=dilation, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_wn_layer_bf16_halo_alignment():
    """bf16 uses a 16-row sublane alignment for the DMA halo; the d=1
    layer exercises the halo > dilation case."""
    from larynx_tpu.models.nn import conv1d, matmul1x1
    from larynx_tpu.ops.wn_layer import fused_wn_layer

    key = jax.random.PRNGKey(23)
    B, T, CH, CC = 1, 520, 256, 640
    ks = jax.random.split(key, 8)
    h = jax.random.normal(ks[0], (B, T, CH), jnp.bfloat16)
    cond = jax.random.normal(ks[1], (B, T, CC), jnp.bfloat16)
    w_in = (jax.random.normal(ks[2], (3, CH, 2 * CH)) * 0.05).astype(jnp.bfloat16)
    b_in = (jax.random.normal(ks[3], (2 * CH,)) * 0.01).astype(jnp.bfloat16)
    w_cond = (jax.random.normal(ks[4], (CC, 2 * CH)) * 0.05).astype(jnp.bfloat16)
    b_cond = (jax.random.normal(ks[5], (2 * CH,)) * 0.01).astype(jnp.bfloat16)
    w_rs = (jax.random.normal(ks[6], (CH, 2 * CH)) * 0.05).astype(jnp.bfloat16)
    b_rs = (jax.random.normal(ks[7], (2 * CH,)) * 0.01).astype(jnp.bfloat16)

    a = conv1d(h, w_in, b_in, dilation=1) + matmul1x1(cond, w_cond, b_cond)
    acts = jnp.tanh(a[..., :CH]) * jax.nn.sigmoid(a[..., CH:])
    ref = matmul1x1(acts, w_rs, b_rs).astype(jnp.float32)

    got = fused_wn_layer(
        h, cond, w_in, b_in, w_cond, b_cond, w_rs, b_rs,
        dilation=1, interpret=True,
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.15)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_wn_layer_state_matches_xla_stack(dtype):
    """fused_wn_layer_state (residual/skip folded into the kernel) must
    walk a whole 3-layer WN stack identically to the XLA composition in
    models/waveglow/model.py::_wn (first/mid/last layer variants)."""
    from larynx_tpu.models.nn import conv1d, matmul1x1
    from larynx_tpu.ops.wn_layer import fused_wn_layer_state

    key = jax.random.PRNGKey(31)
    B, T, CH, CC = 2, 700, 256, 640
    n_layers = 3
    ks = jax.random.split(key, 2 + 4 * n_layers)
    h0 = jax.random.normal(ks[0], (B, T, CH), dtype)
    cond = jax.random.normal(ks[1], (B, T, CC), dtype)
    layers = []
    for i in range(n_layers):
        rs_out = CH if i == n_layers - 1 else 2 * CH
        base = 2 + 4 * i
        layers.append(dict(
            w_in=(jax.random.normal(ks[base], (3, CH, 2 * CH)) * 0.05).astype(dtype),
            b_in=(jax.random.normal(ks[base + 1], (2 * CH,)) * 0.01).astype(dtype),
            w_cond=(jax.random.normal(ks[base + 2], (CC, 2 * CH)) * 0.05).astype(dtype),
            b_cond=jnp.zeros((2 * CH,), dtype),
            w_rs=(jax.random.normal(ks[base + 3], (CH, rs_out)) * 0.05).astype(dtype),
            b_rs=jnp.zeros((rs_out,), dtype),
        ))

    # XLA reference: exactly the _wn composition
    h = h0
    skip = None
    for i, L in enumerate(layers):
        a = conv1d(h, L["w_in"], L["b_in"], dilation=2**i) + matmul1x1(
            cond, L["w_cond"], L["b_cond"]
        )
        acts = jnp.tanh(a[..., :CH]) * jax.nn.sigmoid(a[..., CH:])
        rs = matmul1x1(acts, L["w_rs"], L["b_rs"])
        if i < n_layers - 1:
            h = h + rs[..., :CH]
            s = rs[..., CH:]
        else:
            s = rs
        skip = s if skip is None else skip + s

    # fused: the state walks through the kernel
    hf, sf = h0, None
    for i, L in enumerate(layers):
        hf, sf = fused_wn_layer_state(
            hf, cond, sf, L["w_in"], L["b_in"], L["w_cond"], L["b_cond"],
            L["w_rs"], L["b_rs"],
            dilation=2**i,
            first=(i == 0),
            last=(i == n_layers - 1),
            interpret=True,
        )

    atol = 2e-5 if dtype == jnp.float32 else 0.25
    np.testing.assert_allclose(
        np.asarray(sf, np.float32), np.asarray(skip, np.float32), atol=atol
    )
    if dtype == jnp.float32:
        # h passes through unchanged on the last layer
        np.testing.assert_allclose(np.asarray(hf), np.asarray(h), atol=atol)


def test_waveglow_infer_pallas_matches_xla():
    """End to end: models/waveglow/model.py::infer with use_pallas=True
    (interpret mode) equals the XLA path on a tiny 2-flow config."""
    from larynx_tpu.models.waveglow import WaveGlowConfig
    from larynx_tpu.models.waveglow import model as wg

    cfg = WaveGlowConfig(
        flows=2, wn_layers=3, wn_channels=256, early_every=4, early_size=2
    )
    key = jax.random.PRNGKey(5)
    params = wg.init_params(key, cfg)
    B, M = 1, 8
    mel = jax.random.normal(jax.random.fold_in(key, 1), (B, M, cfg.mel_channels))
    blocks = M * cfg.upsample_stride // cfg.groups
    z = jax.random.normal(jax.random.fold_in(key, 2), (B, blocks, cfg.groups))

    ref = wg.infer(params, cfg, mel, z=z, use_pallas=False)
    got = wg.infer(
        params, cfg, mel, z=z, use_pallas=True, pallas_interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_conv_transpose1d_phased_matches_dilated():
    """The phase-matmul ConvTranspose1d (WaveGlow's upsampler fast path,
    and with torch-'same' padding the HiFi-GAN wide upsample stages)
    equals the dilated-conv lowering's first T*stride samples, including
    the NVIDIA wn_256 geometry (k exactly 4x the stride) and the
    universal_large geometry (k=16, stride=8, padding=4)."""
    from larynx_tpu.models.nn import conv_transpose1d, conv_transpose1d_phased

    key = jax.random.PRNGKey(11)
    for k, stride, ci, co, t, pad in [
        (8, 4, 3, 5, 7, 0),
        (6, 2, 2, 2, 5, 0),
        (4, 4, 1, 3, 4, 0),
        (1024, 256, 4, 3, 3, 0),  # WaveGlow upsampler tap geometry
        (16, 8, 3, 5, 9, 4),  # HiFi-GAN universal_large up0/up1
        (4, 2, 2, 3, 7, 1),  # HiFi-GAN universal_large up2/up3
        (8, 4, 3, 2, 6, 2),  # vctk_small up2
    ]:
        kw, kx = jax.random.split(jax.random.fold_in(key, k * stride + pad))
        w = jax.random.normal(kw, (k, ci, co))
        b = jax.random.normal(jax.random.fold_in(kw, 1), (co,))
        x = jax.random.normal(kx, (2, t, ci))
        ref = conv_transpose1d(x, w, b, stride=stride, padding=pad)
        ref = ref[:, : t * stride, :]
        got = conv_transpose1d_phased(x, w, b, stride=stride, padding=pad)
        assert got.shape == (2, t * stride, co)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4
        )
        # the production WaveGlow path runs bf16 on TPU — pin phased ==
        # dilated at bf16 too (looser tolerance: ~3 decimal digits)
        ref16 = conv_transpose1d(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            stride=stride,
            padding=pad,
        )[:, : t * stride, :]
        got16 = conv_transpose1d_phased(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            stride=stride,
            padding=pad,
        )
        assert got16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got16, dtype=np.float32),
            np.asarray(ref16, dtype=np.float32),
            atol=0.15,
            rtol=0.1,
        )
