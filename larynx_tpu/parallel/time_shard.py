"""Latency-sharding ONE utterance's vocode across the device mesh.

Row (data-parallel) sharding gives throughput but a single long request
is one row — it gains nothing from more chips (parallel/serve.py).  Here
the vocode is split along TIME instead: each device vocodes a haloed mel
window covering its output chunk, exactly the receptive-field math the
streaming chunker uses (runtime/engine.py::stream_halo_frames), and the
chunks concatenate into the full waveform via the shard_map output
sharding.  Peak normalization stays global through a ``pmax`` across the
axis, so the result matches the single-device batched program up to
single-LSB int16 rounding on a <0.1% sample fraction — the identical
guarantee the streaming chunker gives (XLA float convs sum in a
width-dependent order at the ~1 ulp level, so exact bit equality across
different window widths is not a defined target).
tests/test_time_shard.py pins this on an 8-device CPU mesh, including a
halo=0 control proving the halo carries the exactness.

The reference has no analogue: its vocoder is a single ONNX session per
sentence (larynx/hifi_gan.py:150); SURVEY.md §2.4 names time/tensor
sharding of the vocoder convs as the TPU-native extension point.

Latency model
-------------
Per chip the window is ``M/N + 2*halo`` mel frames (interior devices;
edge devices see one halo), so the compute cut over one chip is

    speedup(N) = M / (M/N + 2*halo)

HiFi-GAN universal_large has halo = 36 frames (stream_halo_frames), so a
2048-frame utterance (~23.8 s audio) expects 2048/(256+72) = 6.2x on 8
chips; a 512-frame one 512/(64+72) = 3.8x.  The halo tax means short
utterances should stay on one chip (the engine only routes single-row
batches through this path).  Audio leaves the mesh already int16 and
time-sharded; the host gather is the same byte count as single-chip.

The denoiser's STFT is not chunk-local, so when ``denoise`` is set the
shard_map emits FLOAT chunks and a second (GSPMD-partitioned) jit applies
the global spectral subtraction + int16 conversion; that path matches the
single-device program to ~1 int16 step rather than bit-for-bit.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from larynx_tpu.audio import AudioSettings
from larynx_tpu.models.hifi_gan import denoiser as hifi_denoiser
from larynx_tpu.models.hifi_gan import model as hifi_model


def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


def make_grid_sharded_vocode(
    voc_cfg,
    settings: AudioSettings,
    devices,
    n_rows: int,
    n_time: int,
    halo: int,
    use_pallas: bool = False,
    voc_dtype=jnp.float32,
):
    """Build ``fn(voc_params, mel [B,M,C], z_mask [B,M], bias_spec,
    strength, denoise) -> int16 [B, M*upsample]`` vocoding a batch over a
    ``n_rows x n_time`` device grid: rows split across row shards
    (independent, exact) and each row's time axis splits across haloed
    windows (the streaming receptive-field construction above).

    ``n_rows == 1`` is the single-utterance time shard; ``n_time == 1``
    degenerates to plain row sharding.  Per-device work is
    ``ceil(B/n_rows) * (M/n_time + 2*halo)`` frames; the engine picks the
    grid minimizing it (runtime/engine.py::_grid_vocode_plan) so a 3-row
    batch on 8 chips no longer leaves 5 devices re-vocoding padding
    (the round-4 `_mesh_uniform_groups` behavior).

    ``mel`` is the engine's raw (normalized) mel; the postprocess chain
    runs inside the window program, identical arithmetic to the engine's
    batched vocode (runtime/engine.py::vocode_body) so outputs match
    bit-for-bit when ``denoise`` is False.
    """
    # lazy: engine imports this module lazily too; both module levels
    # stay import-cycle-free
    from larynx_tpu.runtime.engine import SILENCE_LOG_MEL

    import numpy as np

    import larynx_tpu.dsp.mel as dspmel

    devices = list(devices)
    if len(devices) != n_rows * n_time:
        raise ValueError(
            f"grid {n_rows}x{n_time} needs {n_rows * n_time} devices, "
            f"got {len(devices)}"
        )
    mesh = Mesh(
        np.asarray(devices).reshape(n_rows, n_time), ("rows", "time")
    )
    upsample = voc_cfg.total_upsample
    fft = settings.filter_length
    hop = settings.hop_length

    def window_vocode(voc_params, mel, z_mask):
        """Local program: vocode my row shard's haloed window, return my
        chunk as FLOAT audio plus the rows' global peaks over valid
        samples."""
        m = mel.shape[1]
        chunk = m // n_time
        window = min(chunk + 2 * halo, m)
        d = jax.lax.axis_index("time")
        # slide the window inward at the edges so its boundaries coincide
        # with the true array edges (same trick as the streaming chunker)
        w_start = jnp.clip(d * chunk - halo, 0, m - window)
        mel_w = jax.lax.dynamic_slice_in_dim(mel, w_start, window, 1)
        mask_w = jax.lax.dynamic_slice_in_dim(z_mask, w_start, window, 1)

        mel_cm = jnp.swapaxes(mel_w.astype(jnp.float32), 1, 2)
        mel_pp = dspmel.mel_postprocess(mel_cm, settings)
        mel_pp = jnp.where(mask_w[:, None, :] > 0, mel_pp, SILENCE_LOG_MEL)
        audio_w = hifi_model.generator(
            voc_params,
            voc_cfg,
            jnp.swapaxes(mel_pp.astype(voc_dtype), 1, 2),
            use_pallas=use_pallas,
        ).astype(jnp.float32)
        # my chunk's samples within the window
        off = (d * chunk - w_start) * upsample
        audio_c = jax.lax.dynamic_slice_in_dim(
            audio_w, off, chunk * upsample, 1
        )
        # global valid-sample count (z_mask is replicated along the time
        # axis, so every device in a row shard computes the same y_len)
        n_valid = jnp.sum(z_mask, axis=1, dtype=jnp.int32) * upsample
        global_idx = d * chunk * upsample + jnp.arange(chunk * upsample)
        valid = global_idx[None, :] < n_valid[:, None]
        local_peak = jnp.max(
            jnp.where(valid, jnp.abs(audio_c), 0.0), axis=-1
        )
        # peaks are per ROW: reduce across this row shard's time windows
        # only — other row shards hold different rows
        peak = jax.lax.pmax(local_peak, "time")
        return audio_c, peak[:, None], n_valid[:, None]

    def int16_scale(audio, peak):
        scaled = jnp.clip(
            audio * (32767.0 / jnp.maximum(peak, 0.01)),
            -32767.0,
            32767.0,
        )
        return scaled.astype(jnp.int16)

    def sharded_plain(voc_params, mel, z_mask):
        audio_c, peak, _ = window_vocode(voc_params, mel, z_mask)
        # identical per-row peak on every time window -> bit-identical
        # chunks
        return int16_scale(audio_c, peak)

    plain = jax.jit(
        jax.shard_map(
            sharded_plain,
            mesh=mesh,
            in_specs=(P(), P("rows"), P("rows")),
            out_specs=P("rows", "time"),
            check_vma=False,
        )
    )

    float_chunks = jax.jit(
        jax.shard_map(
            window_vocode,
            mesh=mesh,
            in_specs=(P(), P("rows"), P("rows")),
            out_specs=(
                P("rows", "time"),
                P("rows", "time"),
                P("rows", "time"),
            ),
            check_vma=False,
        )
    )

    @jax.jit
    def denoise_int16(audio, bias_spec, strength, n_valid):
        # global program over the grid-sharded float audio: GSPMD
        # partitions the STFT; framing crosses chunk seams, so this is
        # the one stage that cannot stay chunk-local
        audio = hifi_denoiser.denoise(audio, bias_spec, strength, fft, hop)
        nf = jnp.maximum(n_valid - fft, 0)
        nf = -(-nf // hop)
        n_valid = nf * hop + fft
        t = audio.shape[-1]
        valid = jnp.arange(t)[None, :] < n_valid
        peak = jnp.max(jnp.where(valid, jnp.abs(audio), 0.0), axis=-1)
        return int16_scale(audio, peak[:, None])

    def run(
        voc_params,
        mel,
        z_mask,
        bias_spec=None,
        strength=None,
        denoise: bool = False,
    ):
        b, m = mel.shape[0], mel.shape[1]
        m_pad = _round_up(m, n_time)
        if m_pad != m:
            mel = jnp.pad(
                mel, ((0, 0), (0, m_pad - m), (0, 0)),
                constant_values=SILENCE_LOG_MEL,
            )
            z_mask = jnp.pad(z_mask, ((0, 0), (0, m_pad - m)))
        b_pad = _round_up(b, n_rows)
        if b_pad != b:
            mel = jnp.pad(
                mel, ((0, b_pad - b), (0, 0), (0, 0)),
                constant_values=SILENCE_LOG_MEL,
            )
            z_mask = jnp.pad(z_mask, ((0, b_pad - b), (0, 0)))
        with mesh:
            if not denoise:
                out = plain(voc_params, mel, z_mask)
            else:
                audio, _, n_valid = float_chunks(voc_params, mel, z_mask)
                out = denoise_int16(
                    jax.lax.slice_in_dim(audio, 0, b, axis=0),
                    bias_spec,
                    strength,
                    jax.lax.slice_in_dim(n_valid, 0, b, axis=0)[:, :1],
                )
        return out[:b, : m * upsample]

    return run


def make_time_sharded_vocode(
    voc_cfg,
    settings: AudioSettings,
    mesh: Mesh,
    halo: int,
    axis: str = "data",
    use_pallas: bool = False,
    voc_dtype=jnp.float32,
):
    """Build ``fn(voc_params, mel [1,M,C], z_mask [1,M], bias_spec,
    strength, denoise) -> int16 [1, M*upsample]`` vocoding one row's mel
    time-sharded over ``mesh[axis]`` — the ``1 x N`` grid."""
    return make_grid_sharded_vocode(
        voc_cfg,
        settings,
        list(mesh.devices.flat),
        1,
        mesh.shape[axis],
        halo,
        use_pallas=use_pallas,
        voc_dtype=voc_dtype,
    )


def waveglow_halo_frames(voc_cfg) -> int:
    """Mel-frame halo covering WaveGlow's full receptive field.

    The 12 flows chain sequentially, each WN stack sees
    sum(2^i, i<wn_layers) * (k-1)/2 blocks per side, so the total
    block-space halo is flows * (2^layers - 1) for k=3; divided by
    blocks-per-frame (stride/groups) and widened by the cond transposed
    conv's kernel/stride (4 frames at NVIDIA 1024/256 geometry), this is
    the window margin inside which a chunk's samples equal the batched
    program's.  ~100 frames at wn_256 — an order of magnitude beyond
    HiFi-GAN's 36, so the grid plan only fires at long mels.
    """
    per_flow = (voc_cfg.wn_kernel_size - 1) // 2 * (
        2**voc_cfg.wn_layers - 1
    )
    blocks_per_frame = voc_cfg.upsample_stride // voc_cfg.groups
    cond_margin = -(-voc_cfg.upsample_kernel // voc_cfg.upsample_stride)
    return -(-voc_cfg.flows * per_flow // blocks_per_frame) + cond_margin


def make_waveglow_grid_vocode(
    voc_cfg,
    settings: AudioSettings,
    devices,
    n_rows: int,
    n_time: int,
    halo: int,
    voc_dtype=jnp.float32,
):
    """WaveGlow sibling of :func:`make_grid_sharded_vocode`.

    Build ``fn(voc_params, mel [B,M,C], z_mask [B,M], z [B,blocks,g],
    bias_spec, strength, denoise) -> int16 [B, M*stride]`` vocoding a
    batch over an ``n_rows x n_time`` device grid.  ``z`` is the
    engine's pre-drawn, valid-masked prior (replicated along time; each
    window slices its haloed span), so chunk audio matches the batched
    program wherever the halo covers the receptive field
    (:func:`waveglow_halo_frames`).  All flow ops are block-local
    (dilated WN convs, 1x1 convinv, elementwise coupling), so the same
    haloed-window argument as HiFi-GAN applies; the cond upsample is
    recomputed per window from the haloed mel slice.
    """
    from larynx_tpu.runtime.engine import SILENCE_LOG_MEL

    import numpy as np

    import larynx_tpu.dsp.mel as dspmel
    from larynx_tpu.models.waveglow import model as wg_model

    devices = list(devices)
    if len(devices) != n_rows * n_time:
        raise ValueError(
            f"grid {n_rows}x{n_time} needs {n_rows * n_time} devices, "
            f"got {len(devices)}"
        )
    mesh = Mesh(
        np.asarray(devices).reshape(n_rows, n_time), ("rows", "time")
    )
    stride = voc_cfg.upsample_stride
    groups = voc_cfg.groups
    blocks_per_frame = stride // groups
    fft = settings.filter_length
    hop = settings.hop_length

    def window_vocode(voc_params, mel, z_mask, z):
        """Vocode my row shard's haloed mel window; return my chunk as
        FLOAT audio + per-row global peaks + global valid counts."""
        m = mel.shape[1]
        chunk = m // n_time
        window = min(chunk + 2 * halo, m)
        d = jax.lax.axis_index("time")
        w_start = jnp.clip(d * chunk - halo, 0, m - window)
        mel_w = jax.lax.dynamic_slice_in_dim(mel, w_start, window, 1)
        mask_w = jax.lax.dynamic_slice_in_dim(z_mask, w_start, window, 1)
        z_w = jax.lax.dynamic_slice_in_dim(
            z, w_start * blocks_per_frame, window * blocks_per_frame, 1
        )

        mel_cm = jnp.swapaxes(mel_w.astype(jnp.float32), 1, 2)
        mel_pp = dspmel.mel_postprocess(mel_cm, settings)
        mel_pp = jnp.where(mask_w[:, None, :] > 0, mel_pp, SILENCE_LOG_MEL)
        audio_w = wg_model.infer(
            voc_params,
            voc_cfg,
            jnp.swapaxes(mel_pp, 1, 2).astype(voc_dtype),
            z=z_w.astype(voc_dtype),
        ).astype(jnp.float32)
        off = (d * chunk - w_start) * stride
        audio_c = jax.lax.dynamic_slice_in_dim(
            audio_w, off, chunk * stride, 1
        )
        # z_mask is the FULL row (replicated along time): global y_len
        n_valid = jnp.sum(z_mask, axis=1, dtype=jnp.int32) * stride
        global_idx = d * chunk * stride + jnp.arange(chunk * stride)
        valid = global_idx[None, :] < n_valid[:, None]
        local_peak = jnp.max(
            jnp.where(valid, jnp.abs(audio_c), 0.0), axis=-1
        )
        peak = jax.lax.pmax(local_peak, "time")
        return audio_c, peak[:, None], n_valid[:, None]

    def int16_scale(audio, peak):
        scaled = jnp.clip(
            audio * (32767.0 / jnp.maximum(peak, 0.01)),
            -32767.0,
            32767.0,
        )
        return scaled.astype(jnp.int16)

    def sharded_plain(voc_params, mel, z_mask, z):
        audio_c, peak, _ = window_vocode(voc_params, mel, z_mask, z)
        return int16_scale(audio_c, peak)

    specs_in = (P(), P("rows"), P("rows"), P("rows"))
    plain = jax.jit(
        jax.shard_map(
            sharded_plain,
            mesh=mesh,
            in_specs=specs_in,
            out_specs=P("rows", "time"),
            check_vma=False,
        )
    )
    float_chunks = jax.jit(
        jax.shard_map(
            window_vocode,
            mesh=mesh,
            in_specs=specs_in,
            out_specs=(
                P("rows", "time"),
                P("rows", "time"),
                P("rows", "time"),
            ),
            check_vma=False,
        )
    )

    @jax.jit
    def denoise_int16(audio, bias_spec, strength, n_valid):
        audio = hifi_denoiser.denoise(audio, bias_spec, strength, fft, hop)
        nf = jnp.maximum(n_valid - fft, 0)
        nf = -(-nf // hop)
        n_valid = nf * hop + fft
        t = audio.shape[-1]
        valid = jnp.arange(t)[None, :] < n_valid
        peak = jnp.max(jnp.where(valid, jnp.abs(audio), 0.0), axis=-1)
        return int16_scale(audio, peak[:, None])

    def run(
        voc_params,
        mel,
        z_mask,
        z,
        bias_spec=None,
        strength=None,
        denoise: bool = False,
    ):
        b, m = mel.shape[0], mel.shape[1]
        m_pad = _round_up(m, n_time)
        if m_pad != m:
            mel = jnp.pad(
                mel, ((0, 0), (0, m_pad - m), (0, 0)),
                constant_values=SILENCE_LOG_MEL,
            )
            z_mask = jnp.pad(z_mask, ((0, 0), (0, m_pad - m)))
            z = jnp.pad(
                z, ((0, 0), (0, (m_pad - m) * blocks_per_frame), (0, 0))
            )
        b_pad = _round_up(b, n_rows)
        if b_pad != b:
            mel = jnp.pad(
                mel, ((0, b_pad - b), (0, 0), (0, 0)),
                constant_values=SILENCE_LOG_MEL,
            )
            z_mask = jnp.pad(z_mask, ((0, b_pad - b), (0, 0)))
            z = jnp.pad(z, ((0, b_pad - b), (0, 0), (0, 0)))
        with mesh:
            if not denoise:
                out = plain(voc_params, mel, z_mask, z)
            else:
                audio, _, n_valid = float_chunks(voc_params, mel, z_mask, z)
                out = denoise_int16(
                    jax.lax.slice_in_dim(audio, 0, b, axis=0),
                    bias_spec,
                    strength,
                    jax.lax.slice_in_dim(n_valid, 0, b, axis=0)[:, :1],
                )
        return out[:b, : m * stride]

    return run
