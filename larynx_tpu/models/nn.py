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
import numpy as np

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
    padding: int = 0,
) -> jnp.ndarray:
    """ConvTranspose1d as ONE dense MXU matmul, emitting ``T * stride``
    output samples.

    XLA lowers a transposed conv (``conv_transpose1d``) as a convolution
    over the *input-dilated* signal: for WaveGlow's upsampler
    (k=1024, stride=256 — NVIDIA geometry, see
    models/waveglow/config.py) only 1 in 256 taps lands on a real
    sample, so the dilated lowering pays ~256x the true FLOPs and
    measures ~50 ms where ~0.2 ms of matmul suffices.  HiFi-GAN's wide
    upsample stages (k=16, stride=8, padding=4 — hifi_gan/models.py:
    162-171) pay the same 8x tax on the dilated path.  Because
    ``k % stride == 0``, output sample ``t = f*S + p`` depends on exactly
    ``J = k/S`` input frames: with ``q = p + padding``, ``r = q // S``,
    ``q0 = q % S``,

        out[b, f*S + p, co] = sum_j' x[b, f + r - j'] @ w[j'*S + q0]

    which is a [B, T, W*Ci] @ [W*Ci, S*Co] matmul over a shifted-window
    stack of the input (W = J + r_max - r_min distinct shifts) — dense,
    lane-aligned, MXU-shaped.  The block weight is mostly dense: the
    FLOP inflation over the true per-sample cost is W/J (1.5x for the
    HiFi-GAN geometry vs the dilated path's 8x).

    Returns the first ``T*stride`` samples of the torch transposed conv.
    For torch-"same" upsamples (``k - 2*padding == stride``) that is the
    ENTIRE torch output ``(T-1)*S + k - 2*padding``; with padding=0 it is
    exactly the ``[:, :T*stride]`` trim WaveGlow's conditioning upsampler
    keeps.  Other paddings would need tail samples this layout never
    emits, so they are rejected.

    x: [B, T, C_in]; w: [k, C_in, C_out] with ``k % stride == 0``.
    """
    k, ci, co = w.shape
    if k % stride != 0:
        raise ValueError(f"k={k} must be a multiple of stride={stride}")
    if padding != 0 and k - 2 * padding != stride:
        raise ValueError(
            f"phased path needs k - 2*padding == stride (torch-'same' "
            f"upsample) or padding == 0; got k={k} stride={stride} "
            f"padding={padding}"
        )
    j_taps = k // stride
    r_min = padding // stride
    r_max = (stride - 1 + padding) // stride
    n_win = j_taps + r_max - r_min
    bsz, t, _ = x.shape
    # xj[b, f, u*ci + c] = x[b, f + r_max - u, c] (zero outside the signal:
    # those taps reference input frames absent from the true transposed
    # conv sum)
    xpad = jnp.pad(x, ((0, 0), (n_win - 1 - r_max, r_max), (0, 0)))
    windows = [
        jax.lax.dynamic_slice_in_dim(xpad, n_win - 1 - u, t, axis=1)
        for u in range(n_win)
    ]
    xj = jnp.concatenate(windows, axis=-1)  # [B, T, W*Ci]
    if padding == 0:
        # r(p) == 0 for every phase: window u IS tap j' — a pure reshape
        w2 = w.reshape(j_taps, stride, ci, co)
        w2 = jnp.transpose(w2, (0, 2, 1, 3)).reshape(j_taps * ci, stride * co)
    else:
        placement = np.zeros((k, n_win, stride), dtype=np.float32)
        for p in range(stride):
            r, q0 = divmod(p + padding, stride)
            for u in range(n_win):
                jp = r - r_max + u
                if 0 <= jp < j_taps:
                    placement[jp * stride + q0, u, p] = 1.0
        w2 = jnp.einsum(
            "tup,tio->uipo", jnp.asarray(placement, w.dtype), w
        ).reshape(n_win * ci, stride * co)
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
