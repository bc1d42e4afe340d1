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
import numpy as np
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


def auto_tile(c: int) -> int:
    """Default time-tile width for ``c`` (lane-padded) channels.

    VMEM budget: section weights (~126 taps * C^2 * 4B at C=128 is
    ~8 MB) + per-conv intermediates scale with tile * C — keep the
    scoped allocation under the 16 MB limit.  Tile starts and widths
    must respect the 8-row f32 sublane tiling of DMA'd slices (c=384
    would otherwise pick 341 and crash the TPU worker — interpret-mode
    tests cannot catch that, so this helper is unit-tested directly).
    """
    tile = max(256, min(4096, (1 << 17) // c))
    return max(8, tile - tile % 8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_sizes", "dilations_per_block", "tile", "convs_per_unit",
        "interpret", "channels", "total_len",
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
    channels: typing.Optional[int] = None,
    total_len: typing.Optional[int] = None,
) -> jnp.ndarray:
    """x [B, T, C] -> averaged MRF section output [B, T, C].

    ``weights``: flat tuple, 2*convs_per_unit arrays per resblock r —
    ResBlock1 (convs_per_unit=2): convs1_w [n, k_r, C, C], convs1_b [n, C],
    convs2_w, convs2_b; ResBlock2 (convs_per_unit=1): convs_w, convs_b.

    With ``channels`` set, x is ALREADY in packed layout [B, T/P, 128]
    (P = 128 // channels) and the result stays packed — the lane-dense
    vocoder path (larynx_tpu.ops.packed_ups) uses this to keep narrow
    activations out of HBM at padded width.
    """
    if channels is not None:
        return _fused_mrf_packed(
            x, weights, kernel_sizes, dilations_per_block, tile,
            convs_per_unit, interpret, channels=channels, total_len=total_len,
        )

    b, t, c_orig = x.shape

    # Narrow stages (C | 128): time-packed layout — P = 128/C time steps
    # fold into the lanes, so every matmul runs at full MXU width instead
    # of wasting (128 - C)/128 of it on zero padding.
    if c_orig < 128 and 128 % c_orig == 0:
        return _fused_mrf_packed(
            x,
            weights,
            kernel_sizes,
            dilations_per_block,
            tile,
            convs_per_unit,
            interpret,
        )

    # Mosaic requires the minor (lane) dimension aligned to 128; other
    # non-multiple-of-128 widths are zero-padded — the MXU processes 128
    # lanes per cycle either way (zero weights keep padded channels 0).
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
        tile = auto_tile(c)
    else:
        # explicit tiles must still respect the sublane constraint below
        tile = max(8, tile - tile % 8)
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


def _fused_mrf_packed(
    x: jnp.ndarray,
    weights: typing.Tuple[jnp.ndarray, ...],
    kernel_sizes: typing.Tuple[int, ...],
    dilations_per_block: typing.Tuple[typing.Tuple[int, ...], ...],
    tile: typing.Optional[int],
    convs_per_unit: int,
    interpret: bool,
    channels: typing.Optional[int] = None,
    total_len: typing.Optional[int] = None,
) -> jnp.ndarray:
    """Time-packed MRF section for C dividing 128 (see block comment below).

    With ``channels`` set, ``x`` is already in packed layout
    [B, T/P, 128] (lane = p*C + c over P consecutive time steps) holding
    ``total_len`` valid steps, and the result stays packed — used by the
    fully-packed vocoder path so narrow activations never materialize in
    HBM at padded lane width.
    """
    packed_io = channels is not None
    if packed_io:
        b, blocks_in, _ = x.shape
        c = channels
        t = total_len if total_len is not None else blocks_in * (128 // c)
    else:
        b, t, c = x.shape
    P = 128 // c
    PC = 128
    refs_per_block = 2 * convs_per_unit

    # Per-conv packed weights + static shift metadata, in execution order
    packed_refs: typing.List[jnp.ndarray] = []
    conv_meta: typing.List[typing.Tuple[int, int]] = []
    chain_layout: typing.List[typing.Tuple[int, ...]] = []
    for r, (k, dils) in enumerate(zip(kernel_sizes, dilations_per_block)):
        block_w = weights[refs_per_block * r : refs_per_block * (r + 1)]
        layout: typing.List[int] = []
        for j, d in enumerate(dils):
            wp, bp = _pack_conv(block_w[0][j], block_w[1][j], P, d)
            conv_meta.append(_packed_conv_meta(k, d, P))
            layout.append(len(conv_meta) - 1)
            packed_refs += [wp, bp]
            if convs_per_unit == 2:
                wp2, bp2 = _pack_conv(block_w[2][j], block_w[3][j], P, 1)
                conv_meta.append(_packed_conv_meta(k, 1, P))
                layout.append(len(conv_meta) - 1)
                packed_refs += [wp2, bp2]
        chain_layout.append(tuple(layout))

    halo_blocks = max(
        max(_chain_crops(conv_meta, lo)) for lo in chain_layout
    )
    halo_blocks = -(-halo_blocks // 8) * 8  # sublane-safe DMA slice rows

    if tile is None:
        tile_blocks = 512
    else:
        tile_blocks = max(16, tile // P)
    tile_blocks = -(-tile_blocks // 16) * 16

    n_tiles = -(-t // (tile_blocks * P))
    t_blocks = n_tiles * tile_blocks
    if packed_io:
        xp = jnp.pad(
            x,
            ((0, 0), (halo_blocks, t_blocks + halo_blocks - x.shape[1]), (0, 0)),
        )
    else:
        x_padded = jnp.pad(
            x,
            (
                (0, 0),
                (halo_blocks * P, (t_blocks + halo_blocks) * P - t),
                (0, 0),
            ),
        )
        # the packing itself: a free row-major reshape, never a concat
        xp = x_padded.reshape(b, t_blocks + 2 * halo_blocks, PC)

    kernel = _make_packed_kernel(
        tuple(conv_meta),
        tuple(chain_layout),
        tile_blocks,
        halo_blocks,
        t,
        P,
        c,
        x.dtype,
        convs_per_unit,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ] * len(packed_refs)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_blocks, PC),
            lambda bi, ti: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_blocks, PC), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_blocks + 2 * halo_blocks, PC), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, *packed_refs)
    if packed_io:
        return out[:, : x.shape[1], :]
    return out.reshape(b, t_blocks * P, c)[:, :t, :]


# -----------------------------------------------------------------------------
# Time-packed variant for narrow stages (C < 128)
#
# The MXU processes 128 lanes per cycle, so a C=16 stage padded to 128 lanes
# wastes 7/8 of every matmul.  Instead we fold P = 128 // C consecutive time
# steps into the lane dimension: x [T, C] -> xp [T/P, P*C] (a free row-major
# reshape).  A dilated conv over time becomes a short sum of *block-shifted*
# [P*C, P*C] matmuls: for centered tap offsets d*(tap - half), output slot p
# reads input slot (p + off) % P in block (p + off) // P, so each conv is
#
#     out[b] = sum_s  xp[b + s] @ Wp[s],   s in [s_min, s_max]
#
# with Wp[s] a block-banded matrix embedding the tap weights.  The number of
# shifted matmuls (~(k-1)*d/P + k/ceil) is close to the original tap count k,
# but every matmul now runs at full 128-lane width over P x fewer rows —
# up to a P-fold FLOP/bandwidth reduction.  Mosaic cannot lower narrow-lane
# concatenation, which is why the packing comes from layout (reshape), never
# from concat.


def _chain_crops(conv_meta, layout):
    """Blocks a chain consumes at (start, end): sum of each conv's
    (-s_min, s_max) over its layout order."""
    start = sum(-conv_meta[ci][0] for ci in layout)
    end = sum(conv_meta[ci][0] + conv_meta[ci][1] - 1 for ci in layout)
    return start, end


def _packed_conv_meta(k: int, d: int, P: int) -> typing.Tuple[int, int]:
    """(s_min, n_s): block-shift range of a centered (k, d) conv at pack P."""
    half = (k - 1) // 2
    offs = [(tap - half) * d for tap in range(k)]
    s_min = min(o // P for o in offs)  # p_out = 0
    s_max = max((P - 1 + o) // P for o in offs)
    return s_min, s_max - s_min + 1


def _pack_conv(w: jnp.ndarray, bias: jnp.ndarray, P: int, d: int):
    """Conv weights [k, C, C] -> block-banded packed weights [n_s, PC, PC].

    Wp[s][q*C + ci, p*C + co] = sum over taps landing at block-shift s with
    in-slot q for out-slot p of w[tap, ci, co].
    """
    k, c, _ = w.shape
    half = (k - 1) // 2
    s_min, n_s = _packed_conv_meta(k, d, P)
    placement = np.zeros((k, n_s, P, P), dtype=np.float32)
    for tap in range(k):
        off = (tap - half) * d
        for p_out in range(P):
            s = (p_out + off) // P
            p_in = (p_out + off) % P
            placement[tap, s - s_min, p_in, p_out] = 1.0
    wp = jnp.einsum(
        "tsqp,tio->sqipo", jnp.asarray(placement, w.dtype), w
    ).reshape(n_s, P * c, P * c)
    bp = jnp.tile(bias, P)[None, :]  # [1, PC]
    return wp, bp


def _make_packed_kernel(
    conv_meta: typing.Tuple[typing.Tuple[int, int], ...],
    chain_layout: typing.Tuple[typing.Tuple[int, ...], ...],
    tile_blocks: int,
    halo_blocks: int,
    total_len: int,
    P: int,
    C: int,
    out_dtype,
    convs_per_unit: int,
):
    """conv_meta[i] = (s_min, n_s) for the i-th conv in ref order;
    chain_layout[r] = conv indices of resblock r in execution order
    (``convs_per_unit`` consecutive indices form one residual unit)."""
    PC = P * C
    n_convs = len(conv_meta)

    def kernel(x_hbm, *refs):
        weight_refs = refs[: 2 * n_convs]
        out_ref = refs[2 * n_convs]
        x_scratch = refs[2 * n_convs + 1]
        sem = refs[2 * n_convs + 2]

        b = pl.program_id(0)
        i = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * tile_blocks, tile_blocks + 2 * halo_blocks), :],
            x_scratch,
            sem,
        )
        dma.start()
        dma.wait()

        x_tile = x_scratch[:]  # [tile_blocks + 2*halo_blocks, PC]
        tile_origin = i * tile_blocks - halo_blocks  # global block of row 0

        lane_slot = jax.lax.broadcasted_iota(jnp.int32, (1, PC), 1) // C

        def mask_valid(buf, origin_off):
            """Zero packed positions outside the true signal [0, total_len)."""
            blk = (
                jax.lax.broadcasted_iota(jnp.int32, buf.shape, 0)
                + tile_origin
                + origin_off
            )
            t = blk * P + lane_slot
            valid = jnp.logical_and(t >= 0, t < total_len)
            return jnp.where(valid, buf, jnp.zeros_like(buf))

        def conv(buf, origin_off, conv_idx):
            """Centered packed conv; returns (out, new static origin off)."""
            s_min, n_s = conv_meta[conv_idx]
            w_ref = weight_refs[2 * conv_idx]
            b_ref = weight_refs[2 * conv_idx + 1]
            out_len = buf.shape[0] - (n_s - 1)
            acc = jnp.zeros((out_len, PC), dtype=jnp.float32)
            for si in range(n_s):
                acc += jax.lax.dot_general(
                    buf[si : si + out_len, :],
                    w_ref[si],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc += b_ref[:].astype(jnp.float32)
            new_off = origin_off + (-s_min)
            out = mask_valid(acc, new_off)
            return out.astype(buf.dtype), new_off

        n_chains = len(chain_layout)

        total = jnp.zeros((tile_blocks, PC), dtype=jnp.float32)
        for layout in chain_layout:
            # static per-chain consumption, to center each chain on the tile
            start, end = _chain_crops(conv_meta, layout)
            extra_s = halo_blocks - start
            extra_e = halo_blocks - end
            h = x_tile[extra_s : x_tile.shape[0] - extra_e, :]
            off = extra_s  # static origin offset relative to x_tile[0]

            units = [
                layout[i : i + convs_per_unit]
                for i in range(0, len(layout), convs_per_unit)
            ]
            for unit in units:
                xt, off2 = conv(_leaky_relu(h), off, unit[0])
                for ci in unit[1:]:
                    xt, off2 = conv(_leaky_relu(xt), off2, ci)
                s_u = off2 - off
                e_u = (h.shape[0] - xt.shape[0]) - s_u
                h = h[s_u : h.shape[0] - e_u, :] + xt
                off = off2
            total += h.astype(jnp.float32)

        out_ref[0, :, :] = (total / n_chains).astype(out_dtype)

    return kernel


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
