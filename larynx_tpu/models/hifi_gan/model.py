"""HiFi-GAN generator: mel [B, T, n_mels] -> waveform [B, T * 256].

TPU-native re-implementation of the reference generator semantics
(hifi_gan/models.py:16-211): conv_pre -> n x [leaky_relu -> transposed-conv
upsample -> averaged multi-receptive-field resblocks] -> leaky_relu ->
conv_post -> tanh.  Channels-last layout; weight norm is folded at
conversion/init time so inference uses plain convs.
"""

import math
import typing

import jax
import jax.numpy as jnp

from larynx_tpu.models.hifi_gan.config import HiFiGanConfig
from larynx_tpu.models.nn import conv1d, conv_transpose1d, leaky_relu

Params = typing.Dict[str, typing.Any]

LRELU_SLOPE = 0.1


def _resblock1(p: Params, x: jnp.ndarray, kernel_size: int, dilations):
    """ResBlock1: 3 x (lrelu -> dilated conv -> lrelu -> plain conv) residual
    (hifi_gan/models.py:16-98)."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = conv1d(xt, c1["w"], c1["b"], dilation=d)
        xt = leaky_relu(xt, LRELU_SLOPE)
        xt = conv1d(xt, c2["w"], c2["b"], dilation=1)
        x = xt + x
    return x


def _resblock2(p: Params, x: jnp.ndarray, kernel_size: int, dilations):
    """ResBlock2: 2 x (lrelu -> dilated conv) residual
    (hifi_gan/models.py:107-145)."""
    for c, d in zip(p["convs"], dilations):
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = conv1d(xt, c["w"], c["b"], dilation=d)
        x = xt + x
    return x


def generator(
    params: Params,
    cfg: HiFiGanConfig,
    mel: jnp.ndarray,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """mel [B, T, num_mels] -> audio [B, T * total_upsample].

    (hifi_gan/models.py:186-202).  With ``use_pallas`` the MRF resblock
    sections at channel counts <=128 run through the fused VMEM-resident
    Pallas kernel (larynx_tpu.ops.mrf_block); wider stages and ResBlock2
    topologies use the XLA conv path.
    """
    x = conv1d(mel, params["conv_pre"]["w"], params["conv_pre"]["b"], padding=3)

    nk = cfg.num_kernels
    for i, (u, k) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        x = leaky_relu(x, LRELU_SLOPE)
        up = params["ups"][i]
        x = conv_transpose1d(x, up["w"], up["b"], stride=u, padding=(k - u) // 2)

        stage_blocks = [
            params["resblocks"][i * nk + j] for j in range(nk)
        ]
        stage_channels = x.shape[-1]
        if use_pallas and stage_channels <= 128:
            from larynx_tpu.ops.mrf_block import fused_mrf, pack_mrf_weights

            x = fused_mrf(
                x,
                pack_mrf_weights(stage_blocks),
                kernel_sizes=tuple(cfg.resblock_kernel_sizes),
                dilations_per_block=tuple(
                    tuple(d) for d in cfg.resblock_dilation_sizes
                ),
                convs_per_unit=2 if cfg.resblock == "1" else 1,
            )
        else:
            acc = None
            for j in range(nk):
                rb = stage_blocks[j]
                ks = cfg.resblock_kernel_sizes[j]
                ds = cfg.resblock_dilation_sizes[j]
                if cfg.resblock == "1":
                    y = _resblock1(rb, x, ks, ds)
                else:
                    y = _resblock2(rb, x, ks, ds)
                acc = y if acc is None else acc + y
            x = acc / nk

    x = leaky_relu(x, 0.01)  # default torch leaky_relu slope (models.py:198)
    x = conv1d(x, params["conv_post"]["w"], params["conv_post"]["b"], padding=3)
    return jnp.tanh(x)[..., 0]


# -----------------------------------------------------------------------------


def _conv_init(key, k, c_in, c_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(c_in * k)
    return {
        "w": jax.random.uniform(kw, (k, c_in, c_out), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (c_out,), minval=-bound, maxval=bound),
    }


def init_params(key: jax.Array, cfg: HiFiGanConfig) -> Params:
    """Random-init params (benchmarks/tests; checkpoints load via convert)."""
    keys = iter(jax.random.split(key, 512))
    c0 = cfg.upsample_initial_channel
    params: Params = {"conv_pre": _conv_init(next(keys), 7, cfg.num_mels, c0)}

    ups = []
    ch = c0
    for i, (u, k) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        c_out = c0 // (2 ** (i + 1))
        ups.append(_conv_init(next(keys), k, ch, c_out))
        ch = c_out
    params["ups"] = ups

    resblocks = []
    for i in range(len(cfg.upsample_rates)):
        c = c0 // (2 ** (i + 1))
        for ks, ds in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            if cfg.resblock == "1":
                resblocks.append(
                    {
                        "convs1": [_conv_init(next(keys), ks, c, c) for _ in ds],
                        "convs2": [_conv_init(next(keys), ks, c, c) for _ in ds],
                    }
                )
            else:
                resblocks.append(
                    {"convs": [_conv_init(next(keys), ks, c, c) for _ in ds]}
                )
    params["resblocks"] = resblocks
    params["conv_post"] = _conv_init(next(keys), 7, ch, 1)
    return params
