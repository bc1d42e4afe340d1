"""GlowTTS normalizing-flow decoder (mel-spectrogram flow).

TPU-native re-implementation of the reference flow semantics
(glow_tts/models.py:143-213, glow_tts/attentions.py:77-146,
glow_tts/layers.py:83-275, glow_tts/utils.py:135-160).

Design:
  * channels-last [B, T, C] activations
  * the 12 flow blocks share one compiled body — their parameters are
    stacked on a leading axis and executed with ``lax.scan`` (forward) or a
    reversed scan (inference)
  * the WN last-layer shape irregularity (res_skip emits only skip channels,
    glow_tts/layers.py:129-136) is regularized by zero-padding the last
    layer's res half so all layers stack uniformly
  * 1x1 invertible conv inverses are precomputed at load time (the
    ``store_inverse`` trick, glow_tts/layers.py:274-275)
"""

import typing

import jax
import jax.numpy as jnp

from larynx_tpu.models.glow_tts.config import GlowTTSConfig
from larynx_tpu.models.nn import conv1d, matmul1x1

Params = typing.Dict[str, typing.Any]


# -----------------------------------------------------------------------------
# time squeeze / unsqueeze (glow_tts/utils.py:135-160)


def squeeze(x: jnp.ndarray, mask: jnp.ndarray, n_sqz: int):
    """[B, T, C] -> [B, T//n, n*C]; channel block s holds time offset s.

    Mask is subsampled keeping index n-1 of each group (a group is "valid"
    only if its last frame is valid), matching the reference.
    """
    b, t, c = x.shape
    t_trunc = (t // n_sqz) * n_sqz
    x = x[:, :t_trunc].reshape(b, t_trunc // n_sqz, n_sqz * c)
    sub_mask = mask[:, n_sqz - 1 : t_trunc : n_sqz]
    return x * sub_mask[..., None], sub_mask


def unsqueeze(x: jnp.ndarray, mask: jnp.ndarray, n_sqz: int):
    """[B, T', n*C] -> [B, T'*n, C]; inverse of :func:`squeeze`."""
    b, t, nc = x.shape
    c = nc // n_sqz
    x = x.reshape(b, t * n_sqz, c)
    full_mask = jnp.repeat(mask, n_sqz, axis=1)
    return x * full_mask[..., None], full_mask


# -----------------------------------------------------------------------------
# Individual flow steps.  All take/return [B, T, C] + logdet contribution.


def actnorm(p: Params, x, mask, reverse: bool):
    """Per-channel affine (glow_tts/layers.py:173-199)."""
    if reverse:
        z = (x - p["bias"]) * jnp.exp(-p["logs"]) * mask[..., None]
        return z, None
    z = (p["bias"] + jnp.exp(p["logs"]) * x) * mask[..., None]
    x_len = jnp.sum(mask, axis=1)
    logdet = jnp.sum(p["logs"]) * x_len
    return z, logdet


def _group_split(x: jnp.ndarray, n_split: int):
    """Channel regrouping used by InvConvNear (glow_tts/layers.py:247-252).

    [B, T, C] -> [B, T, n_split, C//n_split] with the reference's exact
    (2, C//n_split, n_split//2) factorization of the channel axis.
    """
    b, t, c = x.shape
    x = x.reshape(b, t, 2, c // n_split, n_split // 2)
    x = x.transpose(0, 1, 2, 4, 3)  # [B,T,2,n_split//2,C//n_split]
    return x.reshape(b, t, n_split, c // n_split)


def _group_merge(x: jnp.ndarray, c: int):
    """Inverse of :func:`_group_split`."""
    b, t, n_split, _ = x.shape
    x = x.reshape(b, t, 2, n_split // 2, c // n_split)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, t, c)


def inv_conv_near(p: Params, x, mask, n_split: int, reverse: bool):
    """Invertible 1x1 conv over channel groups (glow_tts/layers.py:224-275)."""
    b, t, c = x.shape
    grouped = _group_split(x, n_split)  # [B,T,S,C/S]
    weight = p["weight_inv"] if reverse else p["weight"]
    mixed = jnp.einsum(
        "sk,btkc->btsc", weight, grouped, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    z = _group_merge(mixed, c) * mask[..., None]
    if reverse:
        return z, None
    x_len = jnp.sum(mask, axis=1)
    _, logabsdet = jnp.linalg.slogdet(p["weight"])
    logdet = logabsdet * (c / n_split) * x_len
    return z, logdet


def wavenet(p: Params, x, mask, dilation_rate: int = 1, g=None):
    """Gated dilated-conv WaveNet stack (glow_tts/layers.py:83-162).

    Layers are stacked on axis 0 of each param (last layer's res half is
    zero-padded so shapes are uniform); hidden width h.  ``g`` is an optional
    [B, 1, 2h*n_layers] speaker conditioning (already passed through the
    cond 1x1).  Layer i uses dilation ``dilation_rate ** i`` (static).
    """
    n_layers = p["in_w"].shape[0]
    h = x.shape[-1]
    mask1 = mask[..., None]
    output = jnp.zeros_like(x)
    for i in range(n_layers):
        x_in = conv1d(x, p["in_w"][i], p["in_b"][i], dilation=dilation_rate**i)
        if g is not None:
            x_in = x_in + jax.lax.dynamic_slice_in_dim(g, i * 2 * h, 2 * h, axis=-1)
        acts = jnp.tanh(x_in[..., :h]) * jax.nn.sigmoid(x_in[..., h:])
        res_skip = matmul1x1(acts, p["res_skip_w"][i], p["res_skip_b"][i])
        x = (x + res_skip[..., :h]) * mask1
        output = output + res_skip[..., h:]
    return output * mask1


def coupling(p: Params, x, mask, cfg: GlowTTSConfig, reverse: bool, g=None):
    """Affine coupling block (glow_tts/attentions.py:77-146)."""
    c = x.shape[-1]
    half = c // 2
    x0, x1 = x[..., :half], x[..., half:]

    # speaker conditioning: g [B, gin] -> [B, 1, 2h*n_layers] through the
    # coupling's (weight-norm-folded) cond 1x1 (glow_tts/layers.py:109-113)
    g_cond = None
    if g is not None and "cond_w" in p["wn"]:
        g_cond = matmul1x1(g, p["wn"]["cond_w"][0], p["wn"]["cond_b"])[:, None, :]

    h = matmul1x1(x0, p["start_w"], p["start_b"]) * mask[..., None]
    h = wavenet(p["wn"], h, mask, dilation_rate=cfg.dilation_rate, g=g_cond)
    out = matmul1x1(h, p["end_w"], p["end_b"])

    m = out[..., :half]
    logs = out[..., half:]
    if cfg.sigmoid_scale:
        logs = jnp.log(1e-6 + jax.nn.sigmoid(logs + 2))

    if reverse:
        z1 = (x1 - m) * jnp.exp(-logs) * mask[..., None]
        logdet = None
    else:
        z1 = (m + jnp.exp(logs) * x1) * mask[..., None]
        logdet = jnp.sum(logs * mask[..., None], axis=(1, 2))
    return jnp.concatenate([x0, z1], axis=-1), logdet


# -----------------------------------------------------------------------------
# Full decoder


def flow_step(block_p: Params, x, mask, cfg: GlowTTSConfig, reverse: bool, g=None):
    """One block = ActNorm -> InvConvNear -> Coupling (or reversed)."""
    if not reverse:
        x, ld1 = actnorm(block_p["actnorm"], x, mask, reverse=False)
        x, ld2 = inv_conv_near(block_p["invconv"], x, mask, cfg.n_split, reverse=False)
        x, ld3 = coupling(block_p["coupling"], x, mask, cfg, reverse=False, g=g)
        return x, ld1 + ld2 + ld3
    x, _ = coupling(block_p["coupling"], x, mask, cfg, reverse=True, g=g)
    x, _ = inv_conv_near(block_p["invconv"], x, mask, cfg.n_split, reverse=True)
    x, _ = actnorm(block_p["actnorm"], x, mask, reverse=True)
    return x, None


def decoder(
    stacked_blocks: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: GlowTTSConfig,
    reverse: bool,
    g=None,
):
    """Full flow decoder (glow_tts/models.py:191-209).

    ``stacked_blocks``: block params stacked on axis 0 (n_blocks_dec).
    Forward (training): returns (z, total_logdet [B]).
    Reverse (inference): returns (mel, None).
    """
    if cfg.n_sqz > 1:
        x, sq_mask = squeeze(x, mask, cfg.n_sqz)
    else:
        sq_mask = mask

    if not reverse:

        def body(carry, block_p):
            h, logdet = carry
            h, ld = flow_step(block_p, h, sq_mask, cfg, reverse=False, g=g)
            return (h, logdet + ld), None

        (x, logdet_tot), _ = jax.lax.scan(
            body, (x, jnp.zeros(x.shape[0], dtype=jnp.float32)), stacked_blocks
        )
    else:

        def body(carry, block_p):
            h, ld = flow_step(block_p, carry, sq_mask, cfg, reverse=True, g=g)
            return h, None

        x, _ = jax.lax.scan(body, x, stacked_blocks, reverse=True)
        logdet_tot = None

    if cfg.n_sqz > 1:
        x, _ = unsqueeze(x, sq_mask, cfg.n_sqz)
    return x, logdet_tot
