"""GlowTTS text encoder: relative-position transformer + duration predictor.

TPU-native re-implementation of the reference encoder semantics
(glow_tts/models.py:52-140, glow_tts/attentions.py:12-74,148-383,
glow_tts/layers.py:31-80).  Everything is channels-last [B, T, C], layers
are stacked along a leading axis and executed with ``lax.scan`` so the
compiled program is independent of layer count, and the relative-position
logits use the O(T * (2T-1)) pad/reshape trick rather than materializing a
[T, T, d] table.

Inference-only: dropout is omitted (rates live in the config for parity).
"""

import typing

import jax
import jax.numpy as jnp

from larynx_tpu.models.glow_tts.config import GlowTTSConfig
from larynx_tpu.models.nn import conv1d, layer_norm, matmul1x1

Params = typing.Dict[str, typing.Any]

ATTN_MASK_VALUE = -1e4  # reference uses masked_fill(-1e4), not -inf


# -----------------------------------------------------------------------------
# Relative-position multi-head self-attention (window_size clipping,
# shared-across-heads embeddings: glow_tts/attentions.py:148-346)


def _pad_relative_embeddings(emb: jnp.ndarray, length: int, window: int):
    """[2w+1, d] learned embeddings -> [2*length-1, d] for sequence length.

    Pad (clip at the window edges implicitly by zero-padding, matching
    glow_tts/attentions.py:284-302) or slice when length <= window+1.
    """
    pad = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad > 0:
        emb = jnp.pad(emb, ((pad, pad), (0, 0)))
    return emb[start : start + 2 * length - 1]


def _relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, L, 2L-1] relative logits -> [B, H, L, L] absolute.

    Standard skewing trick (glow_tts/attentions.py:304-321) — static shapes
    only, no gathers.
    """
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))  # [B,H,L,2L]
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1 :]


def _absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, L, L] attention weights -> [B, H, L, 2L-1] relative layout.

    Inverse skewing (glow_tts/attentions.py:323-335).
    """
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def multi_head_attention(
    p: Params,
    x: jnp.ndarray,
    attn_mask: jnp.ndarray,
    n_heads: int,
    window_size: typing.Optional[int],
    block_length: typing.Optional[int] = None,
) -> jnp.ndarray:
    """Self-attention with optional windowed relative-position terms.

    x: [B, T, C]; attn_mask: [B, 1, T, T] (1 = attend).
    """
    b, t, c = x.shape
    dk = c // n_heads

    q = matmul1x1(x, p["q_w"], p["q_b"]).reshape(b, t, n_heads, dk)
    k = matmul1x1(x, p["k_w"], p["k_b"]).reshape(b, t, n_heads, dk)
    v = matmul1x1(x, p["v_w"], p["v_b"]).reshape(b, t, n_heads, dk)
    q = q.transpose(0, 2, 1, 3)  # [B,H,T,dk]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    scale = 1.0 / jnp.sqrt(jnp.asarray(dk, dtype=x.dtype))
    scores = (
        jnp.einsum("bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32)
        * scale
    )

    if window_size is not None:
        rel_k = _pad_relative_embeddings(p["emb_rel_k"], t, window_size)
        rel_logits = jnp.einsum(
            "bhld,rd->bhlr", q, rel_k, preferred_element_type=jnp.float32
        )
        scores = scores + _relative_to_absolute(rel_logits) * scale

    scores = jnp.where(attn_mask > 0, scores, ATTN_MASK_VALUE)
    if block_length is not None:
        pos = jnp.arange(t)
        band = jnp.abs(pos[None, :] - pos[:, None]) <= block_length
        scores = jnp.where(band[None, None], scores, ATTN_MASK_VALUE)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhlm,bhmd->bhld", probs, v, preferred_element_type=jnp.float32
    )

    if window_size is not None:
        rel_v = _pad_relative_embeddings(p["emb_rel_v"], t, window_size)
        rel_weights = _absolute_to_relative(probs)
        out = out + jnp.einsum(
            "bhlr,rd->bhld", rel_weights, rel_v, preferred_element_type=jnp.float32
        )

    # scores/probs accumulate in f32 for softmax stability; return to the
    # compute dtype before the output projection
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, t, c)
    return matmul1x1(out, p["o_w"], p["o_b"])


# -----------------------------------------------------------------------------


def ffn(p: Params, x: jnp.ndarray, mask: jnp.ndarray, gelu: bool = False):
    """Conv feed-forward (glow_tts/attentions.py:349-383)."""
    h = conv1d(x * mask, p["conv1_w"], p["conv1_b"])
    if gelu:
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.relu(h)
    h = conv1d(h * mask, p["conv2_w"], p["conv2_b"])
    return h * mask


def encoder_stack(
    stacked: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: GlowTTSConfig,
) -> jnp.ndarray:
    """n_layers x (rel-MHA + LN residual, conv-FFN + LN residual).

    ``stacked`` holds per-layer params stacked on axis 0; executed with
    ``lax.scan`` so XLA compiles a single layer body.  ``mask`` is [B, T, 1].
    """
    m = mask[..., 0]
    attn_mask = (m[:, None, :, None] * m[:, None, None, :]) > 0

    def body(carry, layer_p):
        h = carry * mask
        y = multi_head_attention(
            layer_p,
            h,
            attn_mask,
            cfg.n_heads,
            cfg.window_size,
            cfg.block_length,
        )
        h = layer_norm(h + y, layer_p["ln1_g"], layer_p["ln1_b"])
        y = ffn(layer_p, h, mask)
        h = layer_norm(h + y, layer_p["ln2_g"], layer_p["ln2_b"])
        return h, None

    x, _ = jax.lax.scan(body, x, stacked)
    return x * mask


# -----------------------------------------------------------------------------


def prenet(p: Params, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """ConvReluNorm prenet with zero-init residual projection
    (glow_tts/layers.py:31-80)."""
    h = x
    for conv_p in p["layers"]:
        h = conv1d(h * mask, conv_p["w"], conv_p["b"])
        h = layer_norm(h, conv_p["ln_g"], conv_p["ln_b"])
        h = jax.nn.relu(h)
    h = x + matmul1x1(h, p["proj_w"], p["proj_b"])
    return h * mask


def duration_predictor(p: Params, x: jnp.ndarray, mask: jnp.ndarray):
    """conv->relu->LN x2 -> 1x1 proj -> log-durations [B, T, 1]
    (glow_tts/models.py:19-49)."""
    h = conv1d(x * mask, p["conv1_w"], p["conv1_b"])
    h = layer_norm(jax.nn.relu(h), p["ln1_g"], p["ln1_b"])
    h = conv1d(h * mask, p["conv2_w"], p["conv2_b"])
    h = layer_norm(jax.nn.relu(h), p["ln2_g"], p["ln2_b"])
    h = matmul1x1(h * mask, p["proj_w"], p["proj_b"])
    return h * mask
