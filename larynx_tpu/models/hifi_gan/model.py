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
from larynx_tpu.models.nn import (
    conv1d,
    conv_transpose1d,
    conv_transpose1d_phased,
    leaky_relu,
)

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
    pallas_interpret: bool = False,
    phased_ups: bool = False,
) -> jnp.ndarray:
    """mel [B, T, num_mels] -> audio [B, T * total_upsample].

    (hifi_gan/models.py:186-202).  With ``use_pallas`` the narrow late
    stages (C < 128) run entirely in the lane-dense packed layout
    (larynx_tpu.ops.packed_ups + the packed MRF kernel): XLA would store
    a C=16 activation padded to 128 lanes in HBM — 8x the bytes on the
    memory-bound part of synthesis — so upsample, resblocks, and
    conv_post all stay at [rows, 128] until the final time-major audio.
    Stages at C == 128 use the fused VMEM-resident MRF kernel; wider
    stages use the XLA conv path.
    """
    from larynx_tpu.ops.mrf_block import fused_mrf, pack_mrf_weights
    from larynx_tpu.ops.packed_ups import (
        conv_to_time_major,
        conv_transpose_packed,
    )

    x = conv1d(mel, params["conv_pre"]["w"], params["conv_pre"]["b"], padding=3)

    nk = cfg.num_kernels
    mrf_kwargs = dict(
        kernel_sizes=tuple(cfg.resblock_kernel_sizes),
        dilations_per_block=tuple(
            tuple(d) for d in cfg.resblock_dilation_sizes
        ),
        convs_per_unit=2 if cfg.resblock == "1" else 1,
        interpret=pallas_interpret,
    )

    c = x.shape[-1]
    pack = 1  # time steps folded per 128-lane row (1 == plain dense layout)
    for i, (u, k) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        x = leaky_relu(x, LRELU_SLOPE)
        up = params["ups"][i]
        c_out = up["w"].shape[2]
        go_packed = (
            use_pallas
            and c_out < 128
            and 128 % c_out == 0
            and (pack * u * c_out) % 128 == 0
        )
        if go_packed:
            wide = conv_transpose_packed(
                x, up["w"], up["b"], stride=u, padding=(k - u) // 2, c_in=c
            )
            n_rows = wide.shape[1] * (pack * u * c_out) // 128
            x = wide.reshape(wide.shape[0], n_rows, 128)
            c, pack = c_out, 128 // c_out
        else:
            if pack > 1:
                # geometry breaks lane alignment mid-stack (e.g. an odd
                # upsample rate): unpack back to the dense layout — a
                # free row-major reshape — rather than failing
                x = x.reshape(x.shape[0], x.shape[1] * pack, c)
                pack = 1
            pad = (k - u) // 2
            if phased_ups and k % u == 0 and k - 2 * pad == u and k // u <= 16:
                # phased dense matmul (models/nn.py::conv_transpose1d_phased).
                # Off by default — measured NEGATIVE on v5e bf16: the full
                # generator A/B (scripts/profile_vocoder_stages.py --ab-full)
                # read 0.98x/1.01x/1.005x/0.87x across [8,2048]/[3,5120]/
                # [8,512]/[1,2048], i.e. XLA:TPU's conv emitter does NOT pay
                # the naive 8x input-dilation tax at k/stride=2 (unlike
                # WaveGlow's k/stride=256 upsampler where phased is ~250x).
                x = conv_transpose1d_phased(
                    x, up["w"], up["b"], stride=u, padding=pad
                )
            else:
                x = conv_transpose1d(
                    x, up["w"], up["b"], stride=u, padding=pad
                )
            c = c_out

        stage_blocks = [params["resblocks"][i * nk + j] for j in range(nk)]
        if pack > 1:
            x = fused_mrf(
                x,
                pack_mrf_weights(stage_blocks),
                channels=c,
                total_len=x.shape[1] * pack,
                **mrf_kwargs,
            )
        elif use_pallas and c <= 128:
            x = fused_mrf(x, pack_mrf_weights(stage_blocks), **mrf_kwargs)
        else:
            # Wide stages (C >= 256) stay on XLA deliberately: measured on
            # v5e (bf16, [8, 39104, 256]), XLA's conv path hits ~45% MFU
            # and a per-chain fused Pallas variant ran 0.89x of it — at
            # these widths the section is compute-bound, and XLA already
            # fuses the leaky_relus and tiles the MXU well.
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
    if pack > 1:
        audio = conv_to_time_major(
            x, params["conv_post"]["w"], params["conv_post"]["b"], c_in=c
        )
        return jnp.tanh(audio)
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
