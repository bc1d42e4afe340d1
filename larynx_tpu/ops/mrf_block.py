"""Fused multi-receptive-field (MRF) resblock section as a Pallas TPU kernel.

The HiFi-GAN generator's per-stage MRF section — three ResBlock1 chains
(kernel sizes 3/7/11, dilations (1,3,5)) averaged together
(hifi_gan/models.py:16-105,186-202) — is 18 sequential 1-D convolutions.
Run as separate XLA convs, every intermediate round-trips HBM; at the low
channel counts of the late upsampling stages (<=128) the section is
memory-bound.  This kernel processes one time tile per grid step and keeps
ALL 18 convolutions' intermediates in VMEM: one HBM read + one HBM write
per tile for the whole section.

Semantics are exact (not approximate at tile edges): the input is
zero-padded by the section's total receptive-field halo, and after every
convolution the positions outside the true signal are re-zeroed —
reproducing torch's per-conv zero padding bit-for-bit.

Convolutions are computed as k shifted [L, C] x [C, C] matmuls on the MXU
with f32 accumulation.  Weights for the whole section live in VMEM, which
bounds the supported channel count (<=128 at f32, the late stages);
wider stages fall back to the XLA path.
"""

import functools
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1

# ResBlock1 dilation schedule (hifi_gan config: resblock_dilation_sizes)
DEFAULT_DILATIONS = (1, 3, 5)


def chain_halo(
    kernel_size: int,
    dilations: typing.Sequence[int],
    convs_per_unit: int = 2,
) -> int:
    """One chain's receptive-field halo: per unit, (k-1)/2 * d for the
    dilated conv plus (k-1)/2 for the trailing plain conv (ResBlock1
    only; ResBlock2 units have a single dilated conv)."""
    half = (kernel_size - 1) // 2
    plain = half if convs_per_unit == 2 else 0
    return sum(half * d + plain for d in dilations)


def _leaky_relu(x):
    if x.dtype == jnp.bfloat16:
        # Mosaic lacks bf16 vector compares (arith.cmpf) — use max/min form
        zero = jnp.zeros((), dtype=x.dtype)
        return jnp.maximum(x, zero) + jnp.asarray(
            LRELU_SLOPE, x.dtype
        ) * jnp.minimum(x, zero)
    return jnp.where(x >= 0, x, x * LRELU_SLOPE)


def _make_kernel(
    kernel_sizes: typing.Tuple[int, ...],
    dilations_per_block: typing.Tuple[typing.Tuple[int, ...], ...],
    tile: int,
    halo: int,
    total_len: int,
    channels: int,
    out_dtype,
    convs_per_unit: int = 2,
):
    n_blocks = len(kernel_sizes)
    refs_per_block = 2 * convs_per_unit

    def kernel(x_hbm, *refs):
        weight_refs = refs[: refs_per_block * n_blocks]
        out_ref = refs[refs_per_block * n_blocks]
        x_scratch = refs[refs_per_block * n_blocks + 1]
        sem = refs[refs_per_block * n_blocks + 2]

        b = pl.program_id(0)
        i = pl.program_id(1)
        # x_hbm is pre-padded by `halo` zeros on both sides; tile i covers
        # true positions [i*tile - halo, i*tile + tile + halo)
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * tile, tile + 2 * halo), :],
            x_scratch,
            sem,
        )
        dma.start()
        dma.wait()

        x_tile = x_scratch[:]  # [tile + 2*halo, C]

        def mask_valid(buf, local_to_global_offset):
            """Zero positions outside the true signal [0, total_len)."""
            pos = (
                jax.lax.broadcasted_iota(jnp.int32, buf.shape, 0)
                + local_to_global_offset
            )
            valid = jnp.logical_and(pos >= 0, pos < total_len)
            return jnp.where(valid, buf, jnp.zeros_like(buf))

        tile_origin = i * tile - halo  # global position of x_tile[0]

        def conv(buf, offset, w_ref, b_ref, layer, k, d):
            """Valid conv: [L, C] -> [L - (k-1)*d, C]; w_ref [n, k, C, C]."""
            length = buf.shape[0]
            out_len = length - (k - 1) * d
            acc = jnp.zeros((out_len, channels), dtype=jnp.float32)
            for tap in range(k):
                acc += jax.lax.dot_general(
                    buf[tap * d : tap * d + out_len, :],
                    w_ref[layer, tap],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc += b_ref[layer][None, :].astype(jnp.float32)
            # new offset: output position l is input position l + ((k-1)/2)*d
            new_offset = offset + ((k - 1) // 2) * d
            out = mask_valid(acc, tile_origin + new_offset)
            return out.astype(buf.dtype), new_offset

        total = jnp.zeros((tile, channels), dtype=jnp.float32)
        for r in range(n_blocks):
            k = kernel_sizes[r]
            dils = dilations_per_block[r]
            block_refs = weight_refs[refs_per_block * r : refs_per_block * (r + 1)]

            # crop so this chain's output lands exactly on the central tile
            extra = halo - chain_halo(k, dils, convs_per_unit)
            h = x_tile[extra : x_tile.shape[0] - extra, :]
            offset = extra
            for j, d in enumerate(dils):
                half = (k - 1) // 2
                # unit = dilated conv (+ plain conv for ResBlock1)
                unit_halo = half * d + (half if convs_per_unit == 2 else 0)
                xt, off = conv(
                    _leaky_relu(h), offset, block_refs[0], block_refs[1], j, k, d
                )
                if convs_per_unit == 2:
                    xt, off = conv(
                        _leaky_relu(xt), off, block_refs[2], block_refs[3], j, k, 1
                    )
                h = h[unit_halo : h.shape[0] - unit_halo, :] + xt
                offset = off
            total += h.astype(jnp.float32)

        out_ref[0, :, :] = (total / n_blocks).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_sizes", "dilations_per_block", "tile", "convs_per_unit",
        "interpret",
    ),
)
def fused_mrf(
    x: jnp.ndarray,
    weights: typing.Tuple[jnp.ndarray, ...],
    kernel_sizes: typing.Tuple[int, ...] = (3, 7, 11),
    dilations_per_block: typing.Tuple[typing.Tuple[int, ...], ...] = (
        DEFAULT_DILATIONS,
    )
    * 3,
    tile: typing.Optional[int] = None,
    convs_per_unit: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [B, T, C] -> averaged MRF section output [B, T, C].

    ``weights``: flat tuple, 2*convs_per_unit arrays per resblock r —
    ResBlock1 (convs_per_unit=2): convs1_w [n, k_r, C, C], convs1_b [n, C],
    convs2_w, convs2_b; ResBlock2 (convs_per_unit=1): convs_w, convs_b.
    """
    b, t, c_orig = x.shape

    # Mosaic requires the minor (lane) dimension aligned to 128; narrower
    # stages are zero-padded — the MXU processes 128 lanes per cycle either
    # way, so the extra math is free (zero weights keep padded channels 0).
    c = max(128, -(-c_orig // 128) * 128)
    if c != c_orig:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, c - c_orig)))
        weights = tuple(
            jnp.pad(
                w,
                [(0, 0)] * (w.ndim - 1) + [(0, c - c_orig)]
                if w.ndim == 2
                else [(0, 0)] * (w.ndim - 2)
                + [(0, c - c_orig), (0, c - c_orig)],
            )
            for w in weights
        )

    if tile is None:
        # VMEM budget: section weights (~126 taps * C^2 * 4B at C=128 is
        # ~8 MB) + per-conv intermediates scale with tile * C. Keep the
        # scoped allocation under the 16 MB limit.
        tile = max(256, min(4096, (1 << 17) // c))
    halo = max(
        chain_halo(k, d, convs_per_unit)
        for k, d in zip(kernel_sizes, dilations_per_block)
    )
    # keep tile + 2*halo a multiple of the 8-row sublane tiling (a 45-halo
    # DMA crashed the TPU worker); extra halo just widens the crop margin
    halo = -(-halo // 4) * 4

    n_tiles = -(-t // tile)
    t_padded = n_tiles * tile
    x_padded = jnp.pad(
        x, ((0, 0), (halo, t_padded - t + halo), (0, 0))
    )

    kernel = _make_kernel(
        kernel_sizes,
        dilations_per_block,
        tile,
        halo,
        t,
        c,
        x.dtype,
        convs_per_unit=convs_per_unit,
    )

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]  # x DMA'd manually
    for w in weights:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_padded, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_padded, *weights)
    return out[:, :t, :c_orig]


def pack_mrf_weights(resblocks: typing.Sequence[dict]) -> typing.Tuple:
    """Stack a stage's resblock param dicts into the flat tuple
    :func:`fused_mrf` consumes.  ResBlock1 dicts carry convs1/convs2;
    ResBlock2 dicts carry a single convs list."""
    out = []
    for block in resblocks:
        if "convs1" in block:
            out.append(jnp.stack([conv["w"] for conv in block["convs1"]]))
            out.append(jnp.stack([conv["b"] for conv in block["convs1"]]))
            out.append(jnp.stack([conv["w"] for conv in block["convs2"]]))
            out.append(jnp.stack([conv["b"] for conv in block["convs2"]]))
        else:
            out.append(jnp.stack([conv["w"] for conv in block["convs"]]))
            out.append(jnp.stack([conv["b"] for conv in block["convs"]]))
    return tuple(out)
