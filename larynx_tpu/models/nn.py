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
