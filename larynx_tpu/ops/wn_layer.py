"""Fused WaveGlow WN layer as a Pallas TPU kernel.

One conditioned WaveNet layer (models/waveglow/model.py::_wn) is four
HLOs under XLA — dilated k=3 conv, conditioning 1x1, gated tanh/sigmoid,
res/skip 1x1 — with three [B, T, 2*ch] intermediates materialized to HBM
between them (~400 MB per layer at the bench shapes).  The measured
result is ~17% bf16 MFU for a stack that is ~85% MXU math.  This kernel
runs the whole layer out of VMEM: the conv becomes three shifted
[tile, ch] x [ch, 2ch] matmuls on a haloed time tile, the conditioning
matmul and both elementwise stages fuse in, and only the rs output
returns to HBM.

Shapes (channels-last, lane-aligned by construction at wn_256 geometry):
h [B, T, ch=256], cond [B, T, cc=640], w_in [3, ch, 2ch],
w_cond [cc, 2ch], w_rs [ch, rs_out], rs_out in {2ch, ch}.

Two variants:

- ``fused_wn_layer`` — the layer alone; the caller keeps the residual
  add (h + rs[..., :ch]) and skip accumulation in XLA.
- ``fused_wn_layer_state`` — the layer PLUS the residual/skip updates
  (the production path, models/waveglow/model.py::_wn): the rs tensor
  never round-trips to HBM, cutting per-layer traffic ~1.75x.  Measured
  on TPU v5e (bf16, wn_256): 1.99x over the XLA composition at the
  engine's 1-2-row long-T vocode groups, 1.93x at 4x1024, 1.14x at
  8x512; the non-state variant managed only 1.37x/1.00x on the same
  shapes.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=1)
def default_tile() -> int:
    """Time-tile rows per kernel invocation.  Larger tiles amortize the
    per-step weight DMA (~1.7 MB/layer at wn_256) over more MXU work at
    the cost of VMEM.  Full-program A/B on v5e (scripts/ab_wn_tile.py,
    B=8 blocks=16384 bf16, 12-flow infer): 512 -> 163.7 ms,
    1024 -> 159.6 ms (1.03x), 2048/4096 -> scoped-VMEM OOM (19.4/24.0 MB
    vs the 16 MB limit).  1024 is the largest tile that compiles at the
    worst halo (dilation 128).  LARYNX_TPU_WN_TILE overrides for A/B."""
    return int(os.environ.get("LARYNX_TPU_WN_TILE", "1024"))


def _kernel(
    x_hbm,
    cond_ref,
    w_in_ref,
    w_cond_ref,
    w_rs_ref,
    bias_a_ref,
    b_rs_ref,
    out_ref,
    x_scratch,
    sem,
    *,
    tile: int,
    halo: int,
    dilation: int,
    ch: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # x_hbm is pre-padded by `halo` zeros on both sides; the slice start
    # (i*tile) and length (tile + 2*halo) stay sublane-aligned, and the
    # taps index at halo - dilation inside the scratch
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * halo), :],
        x_scratch,
        sem,
    )
    dma.start()
    dma.wait()

    base = halo - dilation
    acc = jnp.zeros((tile, 2 * ch), dtype=jnp.float32)
    for tap in range(3):
        start = base + tap * dilation
        acc += jax.lax.dot_general(
            x_scratch[start : start + tile, :],
            w_in_ref[tap],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc += jax.lax.dot_general(
        cond_ref[0],
        w_cond_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += bias_a_ref[0].astype(jnp.float32)[None, :]

    acts = jnp.tanh(acc[:, :ch]) * jax.nn.sigmoid(acc[:, ch:])
    rs = jax.lax.dot_general(
        acts.astype(w_rs_ref.dtype),
        w_rs_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rs += b_rs_ref[0].astype(jnp.float32)[None, :]
    out_ref[0] = rs.astype(out_ref.dtype)


def _kernel_state(
    x_hbm,
    cond_ref,
    skip_ref,
    w_in_ref,
    w_cond_ref,
    w_rs_ref,
    bias_a_ref,
    b_rs_ref,
    h_out_ref,
    skip_out_ref,
    x_scratch,
    sem,
    *,
    tile: int,
    halo: int,
    dilation: int,
    ch: int,
    first: bool,
    last: bool,
):
    """_kernel plus the residual add and skip accumulation.

    The per-layer kernel leaves ``h + rs[..., :ch]`` / ``skip + s`` to
    XLA, which costs an extra rs round trip to HBM per layer (write 2ch,
    read 2ch, rewrite h and skip).  Here the haloed x tile already in
    VMEM doubles as the residual input, the running skip rides in/out as
    a [tile, ch] block, and only the updated states return to HBM —
    ~1.75x less HBM traffic per layer at wn_256 geometry.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * halo), :],
        x_scratch,
        sem,
    )
    dma.start()
    dma.wait()

    base = halo - dilation
    acc = jnp.zeros((tile, 2 * ch), dtype=jnp.float32)
    for tap in range(3):
        start = base + tap * dilation
        acc += jax.lax.dot_general(
            x_scratch[start : start + tile, :],
            w_in_ref[tap],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc += jax.lax.dot_general(
        cond_ref[0],
        w_cond_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += bias_a_ref[0].astype(jnp.float32)[None, :]

    acts = jnp.tanh(acc[:, :ch]) * jax.nn.sigmoid(acc[:, ch:])
    rs = jax.lax.dot_general(
        acts.astype(w_rs_ref.dtype),
        w_rs_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rs += b_rs_ref[0].astype(jnp.float32)[None, :]
    rs = rs.astype(h_out_ref.dtype)

    h_tile = x_scratch[halo : halo + tile, :]
    if last:
        # rs_out == ch: the whole output is the skip contribution and
        # h is dead after this layer — pass it through for shape parity
        h_out_ref[0] = h_tile
        s = rs
    else:
        h_out_ref[0] = h_tile + rs[:, :ch]
        s = rs[:, ch:]
    if first:
        skip_out_ref[0] = s
    else:
        skip_out_ref[0] = skip_ref[0] + s


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "first", "last", "tile", "interpret"),
)
def fused_wn_layer_state(
    h: jnp.ndarray,
    cond: jnp.ndarray,
    skip,
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    w_cond: jnp.ndarray,
    b_cond: jnp.ndarray,
    w_rs: jnp.ndarray,
    b_rs: jnp.ndarray,
    dilation: int,
    first: bool = False,
    last: bool = False,
    tile: int = 512,
    interpret: bool = False,
):
    """One WN layer INCLUDING the residual/skip state updates.

    Returns ``(h_new, skip_new)`` where ``h_new = h + rs[..., :ch]``
    (or ``h`` unchanged on the last layer, whose rs is all-skip) and
    ``skip_new = skip + s`` (``s`` alone when ``first``).  ``skip`` may
    be None when ``first``.  Matches the XLA composition in
    models/waveglow/model.py::_wn layer-for-layer (same accumulation
    order; the state adds run in the model dtype exactly as XLA's).
    """
    b, t, ch = h.shape
    cc = cond.shape[-1]
    rs_out = w_rs.shape[-1]
    assert last == (rs_out == ch), (rs_out, ch, last)

    grid_t = -(-t // tile)
    t_pad = grid_t * tile
    align = 16 if h.dtype == jnp.bfloat16 else 8
    halo = _round_up(dilation, align)

    x = jnp.pad(h, ((0, 0), (halo, halo + (t_pad - t)), (0, 0)))
    cond_p = jnp.pad(cond, ((0, 0), (0, t_pad - t), (0, 0)))
    if first:
        # never read: a [B, 1, ch] placeholder keeps the spec shape legal
        skip_p = jnp.zeros((b, 1, ch), h.dtype)
        skip_spec = pl.BlockSpec((1, 1, ch), lambda b_, i: (b_, 0, 0))
    else:
        skip_p = jnp.pad(skip, ((0, 0), (0, t_pad - t), (0, 0)))
        skip_spec = pl.BlockSpec((1, tile, ch), lambda b_, i: (b_, i, 0))
    bias_a = (b_in + b_cond).astype(h.dtype)

    kernel = functools.partial(
        _kernel_state,
        tile=tile,
        halo=halo,
        dilation=dilation,
        ch=ch,
        first=first,
        last=last,
    )
    h_new, skip_new = pl.pallas_call(
        kernel,
        grid=(b, grid_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # x: DMA'd manually
            pl.BlockSpec((1, tile, cc), lambda b_, i: (b_, i, 0)),
            skip_spec,
            pl.BlockSpec((3, ch, 2 * ch), lambda b_, i: (0, 0, 0)),
            pl.BlockSpec((cc, 2 * ch), lambda b_, i: (0, 0)),
            pl.BlockSpec((ch, rs_out), lambda b_, i: (0, 0)),
            pl.BlockSpec((1, 2 * ch), lambda b_, i: (0, 0)),
            pl.BlockSpec((1, rs_out), lambda b_, i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, ch), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, tile, ch), lambda b_, i: (b_, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, ch), h.dtype),
            jax.ShapeDtypeStruct((b, t_pad, ch), h.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, ch), h.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        x, cond_p, skip_p, w_in, w_cond, w_rs,
        bias_a[None, :], b_rs.astype(h.dtype)[None, :],
    )
    return h_new[:, :t, :], skip_new[:, :t, :]


@functools.partial(
    jax.jit, static_argnames=("dilation", "tile", "interpret")
)
def fused_wn_layer(
    h: jnp.ndarray,
    cond: jnp.ndarray,
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    w_cond: jnp.ndarray,
    b_cond: jnp.ndarray,
    w_rs: jnp.ndarray,
    b_rs: jnp.ndarray,
    dilation: int,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """rs = (tanh * sigmoid)(conv_d(h) + cond @ w_cond + biases) @ w_rs.

    h [B, T, ch], cond [B, T, cc] -> [B, T, rs_out].  Matches the XLA
    composition in models/waveglow/model.py::_wn for one layer
    (conv1d 'same' + matmul1x1 + gates + matmul1x1) bit-closely (same
    f32 accumulation order per matmul).
    """
    b, t, ch = h.shape
    cc = cond.shape[-1]
    rs_out = w_rs.shape[-1]

    grid_t = -(-t // tile)
    t_pad = grid_t * tile
    # halo covers the dilation and keeps DMA slice lengths
    # sublane-aligned (f32: 8, bf16: 16 rows)
    align = 16 if h.dtype == jnp.bfloat16 else 8
    halo = _round_up(dilation, align)

    x = jnp.pad(h, ((0, 0), (halo, halo + (t_pad - t)), (0, 0)))
    cond_p = jnp.pad(cond, ((0, 0), (0, t_pad - t), (0, 0)))
    bias_a = (b_in + b_cond).astype(h.dtype)

    kernel = functools.partial(
        _kernel, tile=tile, halo=halo, dilation=dilation, ch=ch
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, grid_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # x: DMA'd manually
            pl.BlockSpec((1, tile, cc), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((3, ch, 2 * ch), lambda b_, i: (0, 0, 0)),
            pl.BlockSpec((cc, 2 * ch), lambda b_, i: (0, 0)),
            pl.BlockSpec((ch, rs_out), lambda b_, i: (0, 0)),
            pl.BlockSpec((1, 2 * ch), lambda b_, i: (0, 0)),
            pl.BlockSpec((1, rs_out), lambda b_, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, rs_out), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, rs_out), h.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, ch), h.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        x, cond_p, w_in, w_cond, w_rs,
        bias_a[None, :], b_rs.astype(h.dtype)[None, :],
    )
    return out[:, :t, :]


def supports_geometry(ch: int, cc: int) -> bool:
    """True when the fused WN kernels' VMEM layouts are lane-legal.

    The manually-DMA'd x tile has minor (lane) dim ``ch`` and the
    block-fetched conditioning has minor dim ``cc``; Mosaic requires
    128-aligned minor dims on DMA'd refs (see CLAUDE.md gotchas).  The
    NVIDIA wn_256 geometry (ch=256, cc=640) qualifies; arbitrary
    configs fall back to the XLA path.
    """
    return ch % 128 == 0 and cc % 128 == 0
