"""Lane-dense ("time-packed") HiFi-GAN upsampling path.

XLA:TPU stores a [B, T, C] activation with C < 128 padded to 128 lanes —
a C=16 tensor occupies 8x its bytes in HBM, and every op touching it
(ConvTranspose1d upsamples, leaky_relu, residual adds) pays that
bandwidth.  The vocoder's late stages (C = 64/32/16/8 at millions of time
steps) are exactly the memory-bound part of synthesis
(hifi_gan/models.py:148-202), so this module keeps them in a *packed*
layout instead:

    packed[b, blk, p*C + c] = x[b, blk*P + p, c],   P = 128 / C

Every tensor is [rows, multiple-of-128] — zero lane padding — and the
packing/unpacking between stages is a row-major reshape (free), never a
concat (Mosaic cannot lower narrow-lane concatenation).

In this layout a stride-u ConvTranspose1d becomes a short sum of
*block-shifted dense matmuls*: input block b contributes to output block
groups b+s via a block-banded weight matrix (same construction as the
packed MRF kernel in larynx_tpu.ops.mrf_block).  These run as plain XLA
dot_generals on the MXU — no custom kernel required — and the final
conv_post emits time-major [B, T] directly, so no narrow tensor ever
reaches HBM.
"""

import typing

import jax
import jax.numpy as jnp
import numpy as np


def conv_transpose_packed(
    xp: jnp.ndarray,
    w: jnp.ndarray,
    bias: typing.Optional[jnp.ndarray],
    stride: int,
    padding: int,
    c_in: int,
) -> jnp.ndarray:
    """Torch-semantics ConvTranspose1d on packed input.

    xp: [B, nblk, L] with L = P_in * c_in (multiple of 128),
    w: [k, c_in, c_out].  Returns the *wide* packed output
    [B, nblk, P_in * stride * c_out]; the caller reshapes to the next
    stage's lane width.  Output time length = nblk * P_in * stride, equal
    to torch's (T-1)*stride + k - 2*padding when k - stride = 2*padding
    (the HiFi-GAN geometry, hifi_gan/models.py:162-171).
    """
    b, nblk, lanes = xp.shape
    k, ci, co = w.shape
    assert ci == c_in and lanes % c_in == 0
    p_in = lanes // c_in
    span = p_in * stride  # output time steps per input block
    out_lanes = span * co

    # placement[tap, s, m_local, t_local] = 1 where input step m_local of a
    # block contributes via tap to local output step t_local of group b+s
    offs_min = -padding
    offs_max = (p_in - 1) * stride + (k - 1) - padding
    s_min = offs_min // span
    s_max = offs_max // span
    n_s = s_max - s_min + 1
    placement = np.zeros((k, n_s, p_in, span), dtype=np.float32)
    for tap in range(k):
        for m_local in range(p_in):
            t_off = m_local * stride + tap - padding
            s = t_off // span
            placement[tap, s - s_min, m_local, t_off - s * span] = 1.0
    wt = jnp.einsum(
        "tsmq,tio->smiqo", jnp.asarray(placement, w.dtype), w
    ).reshape(n_s, lanes, out_lanes)

    # out[bo] = sum_s xp[bo - s] @ wt[s]
    xq = jnp.pad(xp, ((0, 0), (max(0, s_max), max(0, -s_min)), (0, 0)))
    out = jnp.zeros((b, nblk, out_lanes), dtype=jnp.float32)
    for si in range(n_s):
        s = s_min + si
        start = s_max - s
        out = out + jax.lax.dot_general(
            jax.lax.slice_in_dim(xq, start, start + nblk, axis=1),
            wt[si],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + jnp.tile(bias, span).astype(jnp.float32)
    return out.astype(xp.dtype)


def conv_to_time_major(
    xp: jnp.ndarray,
    w: jnp.ndarray,
    bias: typing.Optional[jnp.ndarray],
    c_in: int,
) -> jnp.ndarray:
    """'Same'-padded conv with c_out == 1 on packed input -> [B, T].

    Used for conv_post: regroups the packed input into 128-time-step
    rows ([B, T/128, G*128] with G = 128 // P blocks per row — a free
    reshape) and runs block-shifted matmuls emitting [B, T/128, 128],
    i.e. time-major dense audio.  The block-banded weight is mostly
    zeros (~18x FLOP inflation over the true k*C_in per-sample cost),
    which is still negligible next to the bandwidth it saves.
    """
    b, nblk, lanes = xp.shape
    k, ci, co = w.shape
    assert co == 1 and ci == c_in and lanes % c_in == 0
    p = lanes // c_in
    g = 128 // p  # packed blocks per 128-step output row
    assert 128 % p == 0 and nblk % g == 0, (nblk, g)
    half = (k - 1) // 2

    xg = xp.reshape(b, nblk // g, g * lanes)
    rows = nblk // g

    # placement[tap, s, in_step, out_step] over 128-step groups
    s_min = (0 - half) // 128
    s_max = (127 + half) // 128
    n_s = s_max - s_min + 1
    placement = np.zeros((k, n_s, 128, 128), dtype=np.float32)
    for tap in range(k):
        d = tap - half
        for t_out in range(128):
            t_in = t_out + d
            s = t_in // 128
            placement[tap, s - s_min, t_in - s * 128, t_out] = 1.0
    # in lane of xg for time step t_in: (t_in // p)*lanes... within a group,
    # step t corresponds to block t // p, slot t % p -> lane (t//p)*lanes +
    # (t % p)*c_in + i == t*c_in + i (row-major!), so the group is simply
    # [128 * c_in] with stride c_in per step.
    wg = jnp.einsum(
        "tsqo,ti->sqio", jnp.asarray(placement, w.dtype), w[:, :, 0]
    ).reshape(n_s, 128 * c_in, 128)

    # out[bg] = sum_s xg[bg + s] @ wg[s] (s located the INPUT group here,
    # unlike conv_transpose_packed where it located the output group)
    xq = jnp.pad(xg, ((0, 0), (max(0, -s_min), max(0, s_max)), (0, 0)))
    out = jnp.zeros((b, rows, 128), dtype=jnp.float32)
    for si in range(n_s):
        s = s_min + si
        start = s - s_min
        out = out + jax.lax.dot_general(
            jax.lax.slice_in_dim(xq, start, start + rows, axis=1),
            wg[si],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    # keep the f32 accumulation: the engine consumes audio in f32, so a
    # round trip through bf16 here would only add output quantization
    return out.reshape(b, nblk * p)
