"""HiFi-GAN discriminators (training-only), JAX channels-last.

Re-implementation of the reference's multi-period / multi-scale
discriminators (hifi_gan/models.py:214-369).  Weight normalization is a
training-time reparametrization in the reference; here plain weights are
trained directly (forward semantics are identical for given effective
weights — parity tests convert via weight-norm folding).
"""

import math
import typing

import jax
import jax.numpy as jnp

from larynx_tpu.models.nn import leaky_relu

Params = typing.Dict[str, typing.Any]

LRELU_SLOPE = 0.1

PERIODS = (2, 3, 5, 7, 11)

# DiscriminatorP conv ladder: (in, out) channels, kernel 5, stride 3
_P_CHANNELS = ((1, 32), (32, 128), (128, 512), (512, 1024))

# DiscriminatorS ladder: (in, out, kernel, stride, groups)
_S_LAYERS = (
    (1, 128, 15, 1, 1),
    (128, 128, 41, 2, 4),
    (128, 256, 41, 2, 16),
    (256, 512, 41, 4, 16),
    (512, 1024, 41, 4, 16),
    (1024, 1024, 41, 1, 16),
    (1024, 1024, 5, 1, 1),
)


def _conv2d_p(x, w, b, stride):
    """Conv over [B, H, W, C] with kernel [kh, 1, C_in, C_out], stride (s, 1),
    torch 'same-ish' padding (kh//2 on H)."""
    kh = w.shape[0]
    pad = (kh - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, 1),
        padding=[(pad, pad), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _conv1d_s(x, w, b, stride, groups, padding):
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    return y + b


def discriminator_p(p: Params, audio: jnp.ndarray, period: int):
    """One period discriminator: audio [B, T] -> (score [B, N], fmaps).

    (hifi_gan/models.py:262-281): reflect-pad to a period multiple,
    reshape to [B, T//p, p, 1], conv ladder with leaky relu, flatten.
    """
    b, t = audio.shape
    if t % period != 0:
        n_pad = period - (t % period)
        audio = jnp.pad(audio, ((0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    x = audio.reshape(b, t // period, period, 1)

    fmap = []
    for i, conv in enumerate(p["convs"]):
        stride = 3 if i < len(p["convs"]) - 1 else 1
        x = _conv2d_p(x, conv["w"], conv["b"], stride)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = _conv2d_p(x, p["post"]["w"], p["post"]["b"], 1)
    fmap.append(x)
    return x.reshape(b, -1), fmap


def discriminator_s(p: Params, audio: jnp.ndarray):
    """One scale discriminator: audio [B, T] -> (score [B, N], fmaps)."""
    x = audio[..., None]  # [B, T, 1]
    fmap = []
    for conv, (_ci, _co, k, stride, groups) in zip(p["convs"], _S_LAYERS):
        x = _conv1d_s(x, conv["w"], conv["b"], stride, groups, (k - 1) // 2)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = _conv1d_s(x, p["post"]["w"], p["post"]["b"], 1, 1, 1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def _avg_pool1d(x: jnp.ndarray, window: int = 4, stride: int = 2, pad: int = 2):
    """torch AvgPool1d(4, 2, padding=2) semantics (count includes padding)."""
    y = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window),
        window_strides=(1, stride),
        padding=[(0, 0), (pad, pad)],
    )
    return y / window


def multi_period(params: Params, real: jnp.ndarray, fake: jnp.ndarray):
    """(scores_real, scores_fake, fmaps_real, fmaps_fake) over all periods."""
    srs, sgs, frs, fgs = [], [], [], []
    for p, period in zip(params["periods"], PERIODS):
        sr, fr = discriminator_p(p, real, period)
        sg, fg = discriminator_p(p, fake, period)
        srs.append(sr)
        sgs.append(sg)
        frs.append(fr)
        fgs.append(fg)
    return srs, sgs, frs, fgs


def multi_scale(params: Params, real: jnp.ndarray, fake: jnp.ndarray):
    srs, sgs, frs, fgs = [], [], [], []
    y, y_hat = real, fake
    for i, p in enumerate(params["scales"]):
        if i != 0:
            y = _avg_pool1d(y)
            y_hat = _avg_pool1d(y_hat)
        sr, fr = discriminator_s(p, y)
        sg, fg = discriminator_s(p, y_hat)
        srs.append(sr)
        sgs.append(sg)
        frs.append(fr)
        fgs.append(fg)
    return srs, sgs, frs, fgs


# -----------------------------------------------------------------------------
# Losses (hifi_gan/models.py:372-403)


def feature_loss(fmaps_real, fmaps_fake) -> jnp.ndarray:
    loss = 0.0
    for fmap_r, fmap_g in zip(fmaps_real, fmaps_fake):
        for rl, gl in zip(fmap_r, fmap_g):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(scores_real, scores_fake):
    loss = 0.0
    for dr, dg in zip(scores_real, scores_fake):
        loss += jnp.mean(jnp.square(1.0 - dr)) + jnp.mean(jnp.square(dg))
    return loss


def generator_loss(scores_fake) -> jnp.ndarray:
    loss = 0.0
    for dg in scores_fake:
        loss += jnp.mean(jnp.square(1.0 - dg))
    return loss


# -----------------------------------------------------------------------------
# init + torch import


def _conv_init(key, shape, fan_in):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, shape, minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (shape[-1],), minval=-bound, maxval=bound),
    }


def init_discriminators(key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 256))
    periods = []
    for _ in PERIODS:
        convs = []
        for c_in, c_out in _P_CHANNELS:
            convs.append(_conv_init(next(keys), (5, 1, c_in, c_out), c_in * 5))
        convs.append(_conv_init(next(keys), (5, 1, 1024, 1024), 1024 * 5))
        post = _conv_init(next(keys), (3, 1, 1024, 1), 1024 * 3)
        periods.append({"convs": convs, "post": post})

    scales = []
    for _ in range(3):
        convs = []
        for c_in, c_out, k, _s, groups in _S_LAYERS:
            convs.append(
                # torch fan_in counts only the per-group input channels
                _conv_init(
                    next(keys), (k, c_in // groups, c_out), (c_in // groups) * k
                )
            )
        post = _conv_init(next(keys), (3, 1024, 1), 1024 * 3)
        scales.append({"convs": convs, "post": post})

    return {"periods": periods, "scales": scales}


def discriminators_from_state_dict(sd) -> Params:
    """Convert reference MPD+MSD state dicts (prefixes mpd./msd.) into our
    pytree (weight-norm folded, layouts transposed)."""
    import numpy as np

    def fold(prefix):
        if f"{prefix}.weight_v" in sd:
            v = sd[f"{prefix}.weight_v"]
            g = sd[f"{prefix}.weight_g"]
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt(np.sum(np.square(v), axis=axes, keepdims=True))
            return v * (g / norm)
        if f"{prefix}.weight_orig" in sd:
            # spectral norm: W / sigma, sigma = u^T W_mat v
            w = sd[f"{prefix}.weight_orig"]
            u = sd[f"{prefix}.weight_u"]
            v = sd[f"{prefix}.weight_v"]
            w_mat = w.reshape(w.shape[0], -1)
            sigma = float(u @ w_mat @ v)
            return w / sigma
        return sd[f"{prefix}.weight"]

    periods = []
    for i in range(len(PERIODS)):
        convs = []
        for j in range(5):
            w = fold(f"mpd.discriminators.{i}.convs.{j}")
            # torch [C_out, C_in, kh, kw] -> [kh, kw, C_in, C_out]
            convs.append(
                {
                    "w": np.transpose(w, (2, 3, 1, 0)),
                    "b": sd[f"mpd.discriminators.{i}.convs.{j}.bias"],
                }
            )
        w = fold(f"mpd.discriminators.{i}.conv_post")
        post = {
            "w": np.transpose(w, (2, 3, 1, 0)),
            "b": sd[f"mpd.discriminators.{i}.conv_post.bias"],
        }
        periods.append({"convs": convs, "post": post})

    scales = []
    for i in range(3):
        convs = []
        for j in range(7):
            w = fold(f"msd.discriminators.{i}.convs.{j}")
            convs.append(
                {
                    "w": np.transpose(w, (2, 1, 0)),  # [k, C_in/g, C_out]
                    "b": sd[f"msd.discriminators.{i}.convs.{j}.bias"],
                }
            )
        w = fold(f"msd.discriminators.{i}.conv_post")
        post = {
            "w": np.transpose(w, (2, 1, 0)),
            "b": sd[f"msd.discriminators.{i}.conv_post.bias"],
        }
        scales.append({"convs": convs, "post": post})
    return {"periods": periods, "scales": scales}
