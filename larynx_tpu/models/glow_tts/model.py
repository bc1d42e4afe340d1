"""GlowTTS model assembly: parameter init + staged inference functions.

The reference computes everything in one dynamic-shape graph
(glow_tts/models.py:308-354).  On TPU we split inference into two jitted
stages with static shapes:

  stage A  ``encode``            ids [B,T] -> (x_m, x_logs, w_ceil, y_lengths)
           (cheap; host then picks a mel-length bucket M from y_lengths)
  stage B  ``expand_and_decode`` gather-expand means to [B,M,C], sample
           z = mu + sigma * noise * noise_scale, run the reverse flow.

The alignment "matmul with a one-hot path" (glow_tts/models.py:335-345 +
glow_tts/utils.py:99-115) is replaced by an equivalent O(M) gather: frame
t' belongs to phoneme i iff cum_dur[i-1] <= t' < cum_dur[i], so the index is
a comparison-reduction against the cumulative durations — no [T, M] matmul,
no dynamic shapes.
"""

import math
import typing

import jax
import jax.numpy as jnp

from larynx_tpu.models.glow_tts.config import GlowTTSConfig
from larynx_tpu.models.glow_tts import encoder as enc
from larynx_tpu.models.glow_tts import flows
from larynx_tpu.models.nn import matmul1x1, sequence_mask

Params = typing.Dict[str, typing.Any]


# -----------------------------------------------------------------------------
# Initialization (used for benchmarks/tests; released voices load via
# larynx_tpu.convert instead)


def _xavier(key, shape, fan_in, fan_out):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _conv_init(key, k, c_in, c_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(c_in * k)
    return (
        jax.random.uniform(kw, (k, c_in, c_out), minval=-bound, maxval=bound),
        jax.random.uniform(kb, (c_out,), minval=-bound, maxval=bound),
    )


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def init_params(key: jax.Array, cfg: GlowTTSConfig) -> Params:
    """Random-init parameter pytree with the reference's init distributions
    where they matter (zero-init couplings/prenet-proj, orthogonal 1x1)."""
    h = cfg.enc_channels
    dk = cfg.k_channels
    keys = iter(jax.random.split(key, 256))

    encoder: Params = {
        "emb": jax.random.normal(next(keys), (cfg.num_symbols, h)) * (h**-0.5)
    }

    if cfg.prenet:
        layers = []
        for _ in range(3):
            w, b = _conv_init(next(keys), 5, h, h)
            layers.append(
                {"w": w, "b": b, "ln_g": jnp.ones(h), "ln_b": jnp.zeros(h)}
            )
        encoder["prenet"] = {
            "layers": layers,
            "proj_w": jnp.zeros((h, h)),
            "proj_b": jnp.zeros(h),
        }

    enc_layers = []
    rel_std = dk**-0.5
    for _ in range(cfg.n_layers_enc):
        conv1_w, conv1_b = _conv_init(
            next(keys), cfg.kernel_size, h, cfg.filter_channels
        )
        conv2_w, conv2_b = _conv_init(
            next(keys), cfg.kernel_size, cfg.filter_channels, h
        )
        layer = {
            "q_w": _xavier(next(keys), (h, h), h, h),
            "q_b": jnp.zeros(h),
            "k_w": _xavier(next(keys), (h, h), h, h),
            "k_b": jnp.zeros(h),
            "v_w": _xavier(next(keys), (h, h), h, h),
            "v_b": jnp.zeros(h),
            "o_w": _xavier(next(keys), (h, h), h, h),
            "o_b": jnp.zeros(h),
            "ln1_g": jnp.ones(h),
            "ln1_b": jnp.zeros(h),
            "conv1_w": conv1_w,
            "conv1_b": conv1_b,
            "conv2_w": conv2_w,
            "conv2_b": conv2_b,
            "ln2_g": jnp.ones(h),
            "ln2_b": jnp.zeros(h),
        }
        if cfg.window_size is not None:
            layer["emb_rel_k"] = (
                jax.random.normal(next(keys), (2 * cfg.window_size + 1, dk))
                * rel_std
            )
            layer["emb_rel_v"] = (
                jax.random.normal(next(keys), (2 * cfg.window_size + 1, dk))
                * rel_std
            )
        enc_layers.append(layer)
    encoder["layers"] = _stack(enc_layers)

    encoder["proj_m_w"] = _xavier(
        next(keys), (h, cfg.mel_channels), h, cfg.mel_channels
    )
    encoder["proj_m_b"] = jnp.zeros(cfg.mel_channels)
    if not cfg.mean_only:
        encoder["proj_s_w"] = _xavier(
            next(keys), (h, cfg.mel_channels), h, cfg.mel_channels
        )
        encoder["proj_s_b"] = jnp.zeros(cfg.mel_channels)

    fdp = cfg.filter_channels_dp
    dp_in = h + cfg.gin_channels
    dp_conv1_w, dp_conv1_b = _conv_init(next(keys), cfg.kernel_size, dp_in, fdp)
    dp_conv2_w, dp_conv2_b = _conv_init(next(keys), cfg.kernel_size, fdp, fdp)
    encoder["dp"] = {
        "conv1_w": dp_conv1_w,
        "conv1_b": dp_conv1_b,
        "ln1_g": jnp.ones(fdp),
        "ln1_b": jnp.zeros(fdp),
        "conv2_w": dp_conv2_w,
        "conv2_b": dp_conv2_b,
        "ln2_g": jnp.ones(fdp),
        "ln2_b": jnp.zeros(fdp),
        "proj_w": _xavier(next(keys), (fdp, 1), fdp, 1),
        "proj_b": jnp.zeros(1),
    }

    # Flow decoder blocks
    c_sqz = cfg.sqz_channels
    half = c_sqz // 2
    hd = cfg.dec_channels
    blocks = []
    for _ in range(cfg.n_blocks_dec):
        w_init = jnp.linalg.qr(
            jax.random.normal(next(keys), (cfg.n_split, cfg.n_split))
        )[0]
        w_init = jnp.where(jnp.linalg.det(w_init) < 0, w_init.at[:, 0].mul(-1), w_init)

        wn_in_w = []
        wn_in_b = []
        wn_rs_w = []
        wn_rs_b = []
        for i in range(cfg.n_block_layers):
            w, b = _conv_init(next(keys), cfg.kernel_size_dec, hd, 2 * hd)
            wn_in_w.append(w)
            wn_in_b.append(b)
            if i < cfg.n_block_layers - 1:
                w, b = _conv_init(next(keys), 1, hd, 2 * hd)
                wn_rs_w.append(w[0])
                wn_rs_b.append(b)
            else:
                # last layer emits skip only: zero-pad the res half
                w, b = _conv_init(next(keys), 1, hd, hd)
                wn_rs_w.append(
                    jnp.concatenate([jnp.zeros((hd, hd)), w[0]], axis=-1)
                )
                wn_rs_b.append(jnp.concatenate([jnp.zeros(hd), b]))

        start_w, start_b = _conv_init(next(keys), 1, half, hd)
        wn = {
            "in_w": jnp.stack(wn_in_w),
            "in_b": jnp.stack(wn_in_b),
            "res_skip_w": jnp.stack(wn_rs_w),
            "res_skip_b": jnp.stack(wn_rs_b),
        }
        if cfg.n_speakers > 1 and cfg.gin_channels > 0:
            # speaker conditioning 1x1 (reference cond_layer,
            # glow_tts/layers.py:109-113) — without it a from-scratch
            # multi-speaker model would silently ignore g in the decoder
            cw, cb = _conv_init(
                next(keys), 1, cfg.gin_channels, 2 * hd * cfg.n_block_layers
            )
            wn["cond_w"] = cw
            wn["cond_b"] = cb
        blocks.append(
            {
                "actnorm": {"logs": jnp.zeros(c_sqz), "bias": jnp.zeros(c_sqz)},
                "invconv": {
                    "weight": w_init,
                    "weight_inv": jnp.linalg.inv(w_init),
                },
                "coupling": {
                    "start_w": start_w[0],
                    "start_b": start_b,
                    "end_w": jnp.zeros((hd, c_sqz)),
                    "end_b": jnp.zeros(c_sqz),
                    "wn": wn,
                },
            }
        )
    params: Params = {"encoder": encoder, "decoder": _stack(blocks)}

    if cfg.n_speakers > 1:
        params["emb_g"] = jax.random.uniform(
            next(keys), (cfg.n_speakers, cfg.gin_channels), minval=-0.1, maxval=0.1
        )
    return params


# -----------------------------------------------------------------------------
# Stage A: text encoding


def encode(
    params: Params,
    cfg: GlowTTSConfig,
    ids: jnp.ndarray,
    lengths: jnp.ndarray,
    length_scale: jnp.ndarray = 1.0,
    g: typing.Optional[jnp.ndarray] = None,
):
    """ids [B, T] -> (x_m, x_logs, logw, w_ceil, y_lengths, x_mask).

    Reference: glow_tts/models.py:118-140 (TextEncoder.forward) +
    :323-325 (duration math).  ``g`` is an optional [B, gin] normalized
    speaker embedding.  ``logw`` (raw log-durations) is needed by the
    training duration loss.
    """
    p = params["encoder"]
    t = ids.shape[1]
    # mask carries the compute dtype so bf16 params don't get silently
    # promoted back to f32 by mask multiplies
    mask = sequence_mask(lengths, t).astype(p["emb"].dtype)  # [B, T]
    mask1 = mask[..., None]

    x = p["emb"][ids] * math.sqrt(cfg.enc_channels)  # [B, T, h]

    if cfg.prenet:
        x = enc.prenet(p["prenet"], x, mask1)
    x = enc.encoder_stack(p["layers"], x, mask1, cfg)

    x_m = matmul1x1(x, p["proj_m_w"], p["proj_m_b"]) * mask1
    if cfg.mean_only:
        x_logs = jnp.zeros_like(x_m)
    else:
        x_logs = matmul1x1(x, p["proj_s_w"], p["proj_s_b"]) * mask1

    x_dp = jax.lax.stop_gradient(x)
    if g is not None:
        g_exp = jnp.broadcast_to(g[:, None, :], (x.shape[0], t, g.shape[-1]))
        x_dp = jnp.concatenate([x_dp, g_exp], axis=-1)
    logw = enc.duration_predictor(p["dp"], x_dp, mask1)[..., 0]  # [B, T]

    # duration math in f32 regardless of compute dtype (ceil/cumsum accuracy)
    w = jnp.exp(logw.astype(jnp.float32)) * mask.astype(jnp.float32) * length_scale
    w_ceil = jnp.ceil(w)
    y_lengths = jnp.clip(jnp.sum(w_ceil, axis=1), 1, None)
    # truncate to a multiple of n_sqz (glow_tts/models.py:356-363)
    y_lengths = (y_lengths.astype(jnp.int32) // cfg.n_sqz) * cfg.n_sqz
    y_lengths = jnp.maximum(y_lengths, cfg.n_sqz)
    return x_m, x_logs, logw, w_ceil, y_lengths, mask


# -----------------------------------------------------------------------------
# Stage B: alignment expansion + sampling + reverse flow


def expand_and_decode(
    params: Params,
    cfg: GlowTTSConfig,
    x_m: jnp.ndarray,
    x_logs: jnp.ndarray,
    w_ceil: jnp.ndarray,
    y_lengths: jnp.ndarray,
    key: typing.Optional[jax.Array],
    mel_max_length: int,
    noise_scale: jnp.ndarray = 1.0,
    g: typing.Optional[jnp.ndarray] = None,
    row_keys: typing.Optional[jnp.ndarray] = None,
):
    """(x_m [B,T,C], durations [B,T]) -> mel [B, M, C], mel mask [B, M].

    ``mel_max_length`` (M) is the static mel bucket; callers guarantee
    M >= max(y_lengths) and M % n_sqz == 0.

    ``row_keys`` ([B, 2] uint32, one PRNG key per row) replaces ``key``:
    each row's latent noise is drawn from ITS OWN key with frame-major
    layout, so a row's noise depends only on its key — not on the batch
    size, its row index, or the mel bucket (threefry bits are
    counter-indexed, making the [:M] prefix of a wider draw identical).
    This is what lets explicitly-seeded serving requests share a batch
    and stay reproducible (runtime/scheduler.py).
    """
    b, t, c = x_m.shape
    m = mel_max_length

    cum = jnp.cumsum(w_ceil, axis=1)  # [B, T] float
    frames = jnp.arange(m, dtype=cum.dtype)  # [M]
    # phoneme index of each frame: #{i : cum[i] <= t'}
    idx = jnp.sum(
        (cum[:, :, None] <= frames[None, None, :]).astype(jnp.int32), axis=1
    )  # [B, M]
    in_range = idx < t  # frames beyond the total duration get zeros
    idx = jnp.minimum(idx, t - 1)

    gather_idx = idx[..., None]  # [B, M, 1]
    z_m = jnp.take_along_axis(x_m, gather_idx, axis=1)
    z_logs = jnp.take_along_axis(x_logs, gather_idx, axis=1)
    valid = in_range[..., None].astype(x_m.dtype)
    z_m = z_m * valid
    z_logs = z_logs * valid

    z_mask = sequence_mask(y_lengths, m).astype(x_m.dtype)  # [B, M]
    if row_keys is not None:
        noise = jax.vmap(
            lambda k: jax.random.normal(k, (m, c), dtype=x_m.dtype)
        )(row_keys)
    else:
        noise = jax.random.normal(key, (b, m, c), dtype=x_m.dtype)
    z = (
        z_m + jnp.exp(z_logs) * noise * jnp.asarray(noise_scale, x_m.dtype)
    ) * z_mask[..., None]

    mel, _ = flows.decoder(params["decoder"], z, z_mask, cfg, reverse=True, g=g)
    return mel, z_mask


def decode_reverse(params, cfg, z, z_mask, g=None):
    """Raw reverse flow: latent [B, M, C] -> mel [B, M, C]."""
    mel, _ = flows.decoder(params["decoder"], z, z_mask, cfg, reverse=True, g=g)
    return mel


def speaker_embedding(params: Params, speaker_id: jnp.ndarray) -> jnp.ndarray:
    """L2-normalized speaker embedding (glow_tts/models.py:318-319)."""
    g = params["emb_g"][speaker_id]
    return g / jnp.linalg.norm(g, axis=-1, keepdims=True)
