"""GlowTTS training: monotonic alignment search, losses, train step.

The reference repo is inference-only (training lives in the external
glow-tts-train repo; the math here mirrors the training-only pieces that
ARE in-tree: ``maximum_path`` / ``mle_loss`` / ``duration_loss``
(glow_tts/utils.py:14-96) and the forward flow direction
(glow_tts/models.py:191-209)).  Everything is jittable with static shapes:
MAS runs as a ``lax.scan`` Viterbi over mel frames instead of the
reference's host-side numpy loops.
"""

import math
import typing

import jax
import jax.numpy as jnp

from larynx_tpu.models.glow_tts import flows
from larynx_tpu.models.glow_tts.config import GlowTTSConfig
from larynx_tpu.models.glow_tts.model import encode, speaker_embedding

Params = typing.Dict[str, typing.Any]

NEG_INF = -1e9


def maximum_path(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Monotonic alignment search (Viterbi).

    value: [B, T_x, T_y] log-likelihood of phoneme i explaining frame j
    mask:  [B, T_x, T_y] valid region (x_mask x y_mask outer product)
    Returns a hard path [B, T_x, T_y] in {0, 1}.

    Semantics pinned against glow_tts/utils.py:59-96 (the numpy oracle) by
    tests; here the forward pass is a scan over T_y and the backtrack a
    reversed scan with one-hot gathers — fully on device.
    """
    b, t_x, t_y = value.shape
    value = value * mask

    x_range = jnp.arange(t_x, dtype=jnp.float32)[None, :]  # [1, T_x]

    def forward(v, j_and_col):
        j, col = j_and_col  # col: [B, T_x]
        v0 = jnp.pad(v, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :-1]
        v1 = v
        max_mask = v1 >= v0  # True: stay on same phoneme
        v_max = jnp.where(max_mask, v1, v0)
        index_mask = x_range <= j
        v_next = jnp.where(index_mask, v_max + col, NEG_INF)
        return v_next, max_mask

    js = jnp.arange(t_y, dtype=jnp.float32)
    cols = jnp.moveaxis(value, 2, 0)  # [T_y, B, T_x]
    v_init = jnp.zeros((b, t_x), dtype=jnp.float32)
    _, direction = jax.lax.scan(forward, v_init, (js, cols))
    # direction: [T_y, B, T_x] bool; invalid region counts as "stay"
    direction = jnp.where(
        jnp.moveaxis(mask, 2, 0) > 0, direction, True
    )

    # Backtrack from the last valid phoneme of each sequence
    x_lengths = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)  # [B]
    y_valid = jnp.moveaxis(mask[:, 0, :], 1, 0)  # [T_y, B] frame validity

    def backward(index, dir_and_valid):
        dir_j, valid_j = dir_and_valid  # [B, T_x], [B]
        row = jax.nn.one_hot(index, t_x, dtype=jnp.float32) * valid_j[:, None]
        stay = jnp.take_along_axis(
            dir_j.astype(jnp.int32), index[:, None], axis=1
        )[:, 0]
        # move up one phoneme when direction says "came from i-1"
        next_index = jnp.where(valid_j > 0, index + stay - 1, index)
        next_index = jnp.clip(next_index, 0, t_x - 1)
        return next_index, row

    dirs_rev = direction[::-1]
    valid_rev = y_valid[::-1]
    _, rows_rev = jax.lax.scan(
        backward, x_lengths - 1, (dirs_rev, valid_rev)
    )
    path = jnp.moveaxis(rows_rev[::-1], 0, 2)  # [B, T_x, T_y]
    return path * mask


def intersperse(lst: typing.Sequence, item) -> typing.List:
    """[a, b] -> [item, a, item, b, item] (glow_tts/utils.py:8-11; some
    training corpora intersperse a blank id at the symbol level)."""
    result = [item] * (len(lst) * 2 + 1)
    result[1::2] = list(lst)
    return result


def actnorm_ddi_init(
    params: Params,
    cfg: GlowTTSConfig,
    mels: jnp.ndarray,
    mel_lengths: jnp.ndarray,
    speaker_ids: typing.Optional[jnp.ndarray] = None,
) -> Params:
    """Data-dependent initialization of every ActNorm from a warmup batch.

    Mirrors the reference's ddi mode (glow_tts/layers.py:204-221): each
    block's ActNorm is initialized from the masked mean/variance of ITS
    input (which depends on the already-initialized earlier blocks), so
    blocks are processed sequentially front-to-back.  For multi-speaker
    models pass the warmup batch's ``speaker_ids`` so the couplings run
    with the same conditioning training will use.
    """
    g = None
    if speaker_ids is not None and "emb_g" in params:
        g = speaker_embedding(params, jnp.asarray(speaker_ids))
    mel_lengths = (mel_lengths // cfg.n_sqz) * cfg.n_sqz
    m = mels.shape[1]
    y_mask = (jnp.arange(m)[None, :] < mel_lengths[:, None]).astype(jnp.float32)

    x, sq_mask = flows.squeeze(mels, y_mask, cfg.n_sqz)
    mask3 = sq_mask[..., None]

    blocks = params["decoder"]
    n_blocks = cfg.n_blocks_dec
    new_logs = []
    new_bias = []
    for r in range(n_blocks):
        block = jax.tree.map(lambda leaf: leaf[r], blocks)

        denom = jnp.sum(mask3, axis=(0, 1))
        mean = jnp.sum(x * mask3, axis=(0, 1)) / denom
        mean_sq = jnp.sum(jnp.square(x) * mask3, axis=(0, 1)) / denom
        var = mean_sq - jnp.square(mean)
        logs = 0.5 * jnp.log(jnp.clip(var, 1e-6, None))
        bias = -mean * jnp.exp(-logs)
        new_logs.append(-logs)
        new_bias.append(bias)

        block["actnorm"] = {"logs": -logs, "bias": bias}
        x, _ = flows.flow_step(block, x, sq_mask, cfg, reverse=False, g=g)

    updated = dict(params)
    decoder = dict(blocks)
    decoder["actnorm"] = {
        "logs": jnp.stack(new_logs),
        "bias": jnp.stack(new_bias),
    }
    updated["decoder"] = decoder
    return updated


def mle_loss(z, m, logs, logdet, mask) -> jnp.ndarray:
    """Flow maximum-likelihood loss (glow_tts/utils.py:14-23).

    z/m/logs: [B, M, C]; logdet: [B]; mask: [B, M].
    """
    mask3 = mask[..., None]
    loss = jnp.sum(logs * mask3) + 0.5 * jnp.sum(
        jnp.exp(-2 * logs) * jnp.square(z - m) * mask3
    )
    loss = loss - jnp.sum(logdet)
    denom = jnp.sum(mask3) * z.shape[-1]
    return loss / denom + 0.5 * math.log(2 * math.pi)


def duration_loss(logw, logw_hat, lengths) -> jnp.ndarray:
    """L2 log-duration loss (glow_tts/utils.py:26-28)."""
    return jnp.sum(jnp.square(logw - logw_hat)) / jnp.sum(
        lengths.astype(jnp.float32)
    )


def alignment_log_likelihood(
    z: jnp.ndarray, x_m: jnp.ndarray, x_logs: jnp.ndarray
) -> jnp.ndarray:
    """logp [B, T_x, M]: per-(phoneme, frame) Gaussian log likelihood.

    Matches the expanded quadratic form used by glow-tts training: for each
    phoneme i with (mu_i, logs_i) and frame j with latent z_j,
    logp[i,j] = sum_c N(z_j; mu_i, exp(logs_i)) — computed with three
    matmuls (MXU) instead of broadcasting a [B, T_x, M, C] tensor.
    """
    # constants per phoneme
    x_s_sq_r = jnp.exp(-2 * x_logs)  # [B, T_x, C]
    logp1 = jnp.sum(
        -0.5 * math.log(2 * math.pi) - x_logs, axis=-1, keepdims=True
    )  # [B, T_x, 1]
    logp2 = jnp.einsum(
        "btc,bmc->btm", -0.5 * x_s_sq_r, jnp.square(z),
        preferred_element_type=jnp.float32,
    )
    logp3 = jnp.einsum(
        "btc,bmc->btm", x_m * x_s_sq_r, z, preferred_element_type=jnp.float32
    )
    logp4 = jnp.sum(
        -0.5 * jnp.square(x_m) * x_s_sq_r, axis=-1, keepdims=True
    )  # [B, T_x, 1]
    return logp1 + logp2 + logp3 + logp4


def training_forward(
    params: Params,
    cfg: GlowTTSConfig,
    ids: jnp.ndarray,
    id_lengths: jnp.ndarray,
    mels: jnp.ndarray,
    mel_lengths: jnp.ndarray,
    g: typing.Optional[jnp.ndarray] = None,
):
    """One training forward pass -> (loss, metrics dict).

    ids [B, T]; mels [B, M, C] (normalized log-mels, channels-last);
    the mel length is truncated to a multiple of n_sqz like the reference
    preprocess (glow_tts/models.py:356-363).
    """
    mel_lengths = (mel_lengths // cfg.n_sqz) * cfg.n_sqz

    x_m, x_logs, logw, _w_ceil, _y_pred_lengths, x_mask = encode(
        params, cfg, ids, id_lengths, g=g
    )

    m = mels.shape[1]
    y_mask = (
        jnp.arange(m)[None, :] < mel_lengths[:, None]
    ).astype(jnp.float32)

    # forward flow: mel -> latent z with logdet
    z, logdet = flows.decoder(
        params["decoder"], mels, y_mask, cfg, reverse=False, g=g
    )

    # hard alignment via MAS (gradients stopped, like torch.no_grad())
    logp = alignment_log_likelihood(
        jax.lax.stop_gradient(z),
        jax.lax.stop_gradient(x_m),
        jax.lax.stop_gradient(x_logs),
    )
    attn_mask = x_mask[:, :, None] * y_mask[:, None, :]
    attn = jax.lax.stop_gradient(maximum_path(logp, attn_mask))

    # expand phoneme stats to frames through the hard path
    z_m = jnp.einsum(
        "btm,btc->bmc", attn, x_m, preferred_element_type=jnp.float32
    )
    z_logs = jnp.einsum(
        "btm,btc->bmc", attn, x_logs, preferred_element_type=jnp.float32
    )
    logw_hat = jnp.log(1e-8 + jnp.sum(attn, axis=2)) * x_mask

    l_mle = mle_loss(z, z_m, z_logs, logdet, y_mask)
    l_dur = duration_loss(logw, logw_hat, id_lengths)
    loss = l_mle + l_dur
    return loss, {"mle_loss": l_mle, "duration_loss": l_dur, "loss": loss}
