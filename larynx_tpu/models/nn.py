"""Shared functional NN primitives, channels-last ([B, T, C]) layout.

TPU-first conventions:
  * activations are [batch, time, channels] so XLA tiles the channel axis
    onto the 128-wide lane dimension and convs lower to MXU matmuls
  * parameters are plain pytrees (nested dicts of jnp arrays); weight layouts
    are [k, C_in, C_out] ('HIO') for convs, [C_in, C_out] for projections
  * weight normalization from reference checkpoints is folded into plain
    weights at conversion time (matching the semantics of
    ``remove_weight_norm``, hifi_gan/models.py:204-211)
"""

import typing

import jax
import jax.numpy as jnp

Params = typing.Dict[str, typing.Any]


def matmul1x1(x: jnp.ndarray, w: jnp.ndarray, b=None) -> jnp.ndarray:
    """Pointwise (1x1) conv as a single MXU matmul.

    x: [..., C_in], w: [C_in, C_out], b: [C_out] or None.
    """
    y = jnp.einsum("...i,io->...o", x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b=None,
    stride: int = 1,
    dilation: int = 1,
    padding: typing.Union[str, int, None] = None,
) -> jnp.ndarray:
    """1-D convolution, channels-last.

    x: [B, T, C_in], w: [k, C_in, C_out].  ``padding=None`` means torch-style
    'same' for odd kernels: (k*d - d) // 2 on both sides.
    """
    k = w.shape[0]
    if padding is None:
        pad = (k * dilation - dilation) // 2
        pads = [(pad, pad)]
    elif isinstance(padding, int):
        pads = [(padding, padding)]
    else:
        pads = padding
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pads,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b=None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Torch-semantics ConvTranspose1d, channels-last.

    x: [B, T, C_in], w: [k, C_in, C_out] (already transposed/flipped from
    torch's [C_in, C_out, k] at conversion time is NOT assumed — ``w`` here
    is the *correlation* kernel; we implement transposed conv as an
    input-dilated convolution with the kernel flipped along time).

    Output length: (T - 1) * stride + k - 2 * padding
    (matches torch.nn.ConvTranspose1d, hifi_gan/models.py:162-171).
    """
    k = w.shape[0]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        w[::-1],  # flip taps: transposed conv correlates with flipped kernel
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d_phased(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b=None,
    stride: int = 1,
) -> jnp.ndarray:
    """ConvTranspose1d (padding=0) as ONE dense MXU matmul, trimmed to
    ``T * stride`` output samples.

    XLA lowers a transposed conv (``conv_transpose1d``) as a convolution
    over the *input-dilated* signal: for WaveGlow's upsampler
    (k=1024, stride=256 — NVIDIA geometry, see
    models/waveglow/config.py) only 1 in 256 taps lands on a real
    sample, so the dilated lowering pays ~256x the true FLOPs and
    measures ~50 ms where ~0.2 ms of matmul suffices.  Because
    ``k % stride == 0``, output sample ``f*stride + p`` depends on
    exactly ``k/stride`` input frames:

        out[b, f*S + p, co] = sum_j sum_ci x[b, f-j, ci] * w[j*S + p, ci, co]

    which is a [B, T, J*Ci] @ [J*Ci, S*Co] matmul over a shifted-window
    stack of the input — dense, lane-aligned, MXU-shaped.

    Returns the FIRST ``T*stride`` samples of the torch transposed conv
    (whose full length is ``T*stride + (k - stride)``) — i.e. exactly the
    ``[:, :T*stride]`` trim WaveGlow's conditioning upsampler keeps.

    x: [B, T, C_in]; w: [k, C_in, C_out] with ``k % stride == 0``.
    """
    k, ci, co = w.shape
    if k % stride != 0:
        raise ValueError(f"k={k} must be a multiple of stride={stride}")
    j_taps = k // stride
    bsz, t, _ = x.shape
    # xj[b, f, j*ci + c] = x[b, f - j, c]  (zero for f - j < 0: those taps
    # reference input frames before the signal, absent in the true
    # transposed conv sum)
    xpad = jnp.pad(x, ((0, 0), (j_taps - 1, 0), (0, 0)))
    windows = [
        jax.lax.dynamic_slice_in_dim(xpad, j_taps - 1 - j, t, axis=1)
        for j in range(j_taps)
    ]
    xj = jnp.concatenate(windows, axis=-1)  # [B, T, J*Ci]
    w2 = w.reshape(j_taps, stride, ci, co)
    w2 = jnp.transpose(w2, (0, 2, 1, 3)).reshape(j_taps * ci, stride * co)
    y = jnp.einsum("btj,jo->bto", xj, w2, preferred_element_type=x.dtype)
    y = y.reshape(bsz, t * stride, co)
    if b is not None:
        y = y + b
    return y


def layer_norm(
    x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-4
) -> jnp.ndarray:
    """LayerNorm over the channel (last) axis.

    Matches the reference's channel-dim LayerNorm with eps=1e-4
    (glow_tts/layers.py:10-28); in channels-last layout this is a plain
    last-axis normalization — ideal for the VPU.
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_length] float32 {0,1} mask."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return (pos[None, :] < lengths[:, None]).astype(jnp.float32)


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def fold_weight_norm(v: jnp.ndarray, g: jnp.ndarray, dim_out_axis: int = 0):
    """Fold weight-norm (w = g * v / ||v||) into a plain weight.

    ``v``/``g`` in torch layout where ``dim_out_axis`` indexes output
    channels and the norm is over all remaining axes per output channel.
    """
    axes = tuple(i for i in range(v.ndim) if i != dim_out_axis)
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    g_shape = [1] * v.ndim
    g_shape[dim_out_axis] = -1
    return v * (g.reshape(g_shape) / norm)
