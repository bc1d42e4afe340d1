"""The TPU synthesis engine: staged, bucketed, batched inference.

Pipeline (all stages jitted, one XLA program per (batch, length) bucket):

  stage A  encode      ids [B,T]        -> means/log-durations   (MXU-light)
  stage B  decode      means [B,T]      -> mel [B,M,C]           (flow reverse)
  stage C  vocode      mel [B,M,C]      -> audio [B,M*up]        (conv-heavy)

Between A and B the host reads the per-sentence mel lengths (a [B] int
transfer) and picks the mel bucket M — the only host sync in the pipeline.
The reference instead runs ONNX Runtime per sentence at batch 1 on CPU
(larynx/glow_tts.py:156-168, larynx/hifi_gan.py:150); batching across
sentences/requests plus static-shape reuse is where the TPU build wins.
"""

import functools
import math
import logging
import os
import threading
import typing

import jax
import jax.numpy as jnp
import numpy as np

from larynx_tpu.audio import AudioSettings
from larynx_tpu.audio import mel_basis as make_mel_basis
import larynx_tpu.dsp.mel as dspmel
import larynx_tpu.dsp.stft as dsp
from larynx_tpu.models.glow_tts import GlowTTSConfig
from larynx_tpu.models.glow_tts import model as glow_model
from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan import model as hifi_model
from larynx_tpu.models.hifi_gan import denoiser as hifi_denoiser
from larynx_tpu.runtime.buckets import BucketPolicy

_LOGGER = logging.getLogger("larynx_tpu.engine")


def _enable_persistent_compile_cache() -> None:
    """Persist XLA executables across processes (server restarts, CLI runs)
    so bucket warm-up pays compilation once per machine, not per process."""
    import os

    if jax.config.jax_compilation_cache_dir:
        return
    cache_dir = os.environ.get("LARYNX_TPU_COMPILE_CACHE")
    if cache_dir is None:
        base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        cache_dir = os.path.join(base, "larynx_tpu", "xla_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort
        _LOGGER.debug("could not enable persistent compile cache", exc_info=True)

SILENCE_LOG_MEL = float(np.log(1e-5))


def default_use_pallas() -> bool:
    """Pallas kernels only lower on real TPU backends;
    ``LARYNX_TPU_NO_PALLAS`` is the kill switch for Mosaic crashes.
    Shared by the engine and the standalone vocoder wrappers."""
    import os

    return jax.default_backend() not in ("cpu",) and not os.environ.get(
        "LARYNX_TPU_NO_PALLAS"
    )


def default_vocoder_half() -> bool:
    """Production default for vocoder precision: bfloat16 on TPU backends
    (2x the MXU rate and half the HBM traffic; the tanh-bounded HiFi-GAN
    waveform is audibly identical), float32 elsewhere (CPU parity tests).
    ``LARYNX_TPU_VOCODER_PRECISION={bf16,f32}`` overrides."""
    import os

    pref = os.environ.get("LARYNX_TPU_VOCODER_PRECISION", "").lower()
    if pref in ("bf16", "bfloat16", "half"):
        return True
    if pref in ("f32", "float32", "full"):
        return False
    return jax.default_backend() not in ("cpu",)


def stream_halo_frames(voc_cfg: "HiFiGanConfig") -> int:
    """Mel-frame halo outside which a vocoded sample cannot depend on a
    chunk boundary: walk the receptive field backward through conv_post,
    each stage's MRF section and transposed conv, and conv_pre.  Chunked
    vocoding with this halo is bit-identical to the full run."""
    from larynx_tpu.ops.mrf_block import chain_halo

    h = 3  # conv_post 'same' halo, samples at the last stage's rate
    for i in reversed(range(len(voc_cfg.upsample_rates))):
        u = voc_cfg.upsample_rates[i]
        k = voc_cfg.upsample_kernel_sizes[i]
        h += max(
            chain_halo(kk, dd, 2 if voc_cfg.resblock == "1" else 1)
            for kk, dd in zip(
                voc_cfg.resblock_kernel_sizes, voc_cfg.resblock_dilation_sizes
            )
        )
        pad = (k - u) // 2
        h = -(-(h + (k - 1 - pad)) // u)  # transposed-conv back-map
    return h + 3  # conv_pre halo (k=7, 'same') in mel frames

# Upper bound on (rows x mel frames) per vocoder invocation.  The HiFi-GAN
# upsampling stack holds several [B, M*256, ch] activations live; unbounded
# batch x bucket products blow past HBM.  Rows above this area are vocoded
# in sub-batches of a fixed power-of-two size (which also pipelines their
# device->host copies against later groups' compute).  The lane-dense
# packed layout stores narrow stages unpadded, so the area can be ~4x the
# old padded-layout limit: 8 x 8192 frames compiles in ~9 GB on v5e.
MAX_VOCODE_AREA = int(os.environ.get("LARYNX_TPU_MAX_VOCODE_AREA", "16384"))


@functools.lru_cache(maxsize=1)
def ramp_first_group() -> bool:
    """Ramp multi-group vocode plans (1, 1, 2, ... rows) so the first
    device->host audio copy starts after a 1-row compute instead of a full
    group's — the large-batch wall clock is link-start-gated (see
    ``_ragged_group_plan``).  LARYNX_TPU_RAMP_FIRST_GROUP=0 disables."""
    return os.environ.get(
        "LARYNX_TPU_RAMP_FIRST_GROUP", "1"
    ).lower() not in ("0", "false", "no")


def waveglow_area() -> int:
    """Per-dispatch (rows x mel-frames) budget for WaveGlow vocode.
    Read per launch (not cached): it follows MAX_VOCODE_AREA, which
    tests monkeypatch.

    A quarter of MAX_VOCODE_AREA (WN buffers are ~3-5x HiFi's worst
    stage per frame), which at the pangram geometry (8 rows x 5120-frame
    bucket) means 1-row groups — eight serial dispatches.  Negative
    result (round 5, same-process alternating A/B, 6 pairs): raising it
    to MAX_VOCODE_AREA (3-row groups, 3 dispatches) measured 34% SLOWER
    (median RTF 0.004343 vs 0.003237) — the 1-row groups pipeline each
    row's ~2.6 MB audio D2H behind the next row's compute, worth far
    more than the saved ~24 ms dispatch round trips, and the 3-row
    program's ~630 MB cond buffer adds HBM pressure.
    LARYNX_TPU_WAVEGLOW_AREA overrides for re-measurement."""
    return int(
        os.environ.get(
            "LARYNX_TPU_WAVEGLOW_AREA", str(MAX_VOCODE_AREA // 4)
        )
    )


@functools.lru_cache(maxsize=1)
def fused_encode_enabled() -> bool:
    """Fuse encode + flow decode into one jitted dispatch on the
    predicted mel bucket (single-device, unseeded batches).

    Default OFF — negative result (round 5, same-process alternating
    A/B on the pangram batch, 10 pairs): fused median RTF 0.001458 vs
    two-step 0.001378 (fused 5.8% SLOWER).  The saved ~24 ms dispatch
    round trip loses to the two-step path's pipelining: the small encode
    program materializes y_lengths early, so its device->host sync AND
    the vocode dispatch both overlap the decode's device compute, while
    the fused program cannot surface y_lengths (which the ragged vocode
    group plan needs on host) until encode+decode have BOTH finished.
    Same lesson as the decode+vocode fusion negative result
    (synthesize_launch).  LARYNX_TPU_FUSED_ENCODE=1 enables for
    re-measurement."""
    return os.environ.get(
        "LARYNX_TPU_FUSED_ENCODE", "0"
    ).lower() not in ("0", "false", "no")


@functools.lru_cache(maxsize=1)
def ramp_min_bytes() -> int:
    """Ramping only pays when the audio transfer, not compute, gates the
    wall clock: each extra ramp group costs a ~24 ms dispatch round trip
    through the tunnel, worth it for a 20 MB pangram batch (~450 ms on the
    ~50 MB/s link) but a pure loss for a ~3 MB SSML voice unit (the round-4
    SSML profile showed a 6-row unit fragmented into 4 vocode dispatches).
    Plans whose estimated int16 transfer is below this many bytes skip the
    ramp.  LARYNX_TPU_RAMP_MIN_BYTES overrides (0 ramps everything)."""
    return int(os.environ.get("LARYNX_TPU_RAMP_MIN_BYTES", "8000000"))


@functools.lru_cache(maxsize=1)
def vocode_pool_enabled() -> bool:
    """Pool the vocode of multiple per-voice units that share a vocoder
    (a multi-voice SSML document) into ONE ragged launch: one dispatch
    chain and ONE device->host audio stream instead of one per voice —
    concurrent D2H copies through the tunnel are pathological (measured,
    see BENCH_NOTES) and each extra dispatch is a ~24 ms round trip.
    LARYNX_TPU_VOCODE_POOL=0 disables."""
    return os.environ.get(
        "LARYNX_TPU_VOCODE_POOL", "1"
    ).lower() not in ("0", "false", "no")


@functools.partial(jax.jit, static_argnames=("n_valids", "m_pool"))
def _pool_rows(mels, masks, n_valids: tuple, m_pool: int):
    """Concatenate the first n_valids[i] rows of each (mel, mask) pair,
    zero-padding every unit's frame axis to ``m_pool``.

    Padded frames carry a zero mask, so the pooled vocode masks them
    exactly as the uniform-width path would (vocode_body postprocess) —
    pooling changes only WHERE a row is vocoded, not its audio (same
    equivalence class as the ragged-vs-uniform plan, pinned by
    tests/test_engine_ragged.py).
    """
    out_mel, out_mask = [], []
    for mel, mask, n in zip(mels, masks, n_valids):
        pad = m_pool - mel.shape[1]
        mel_n = jax.lax.slice(
            mel, (0, 0, 0), (n, mel.shape[1], mel.shape[2])
        )
        mask_n = jax.lax.slice(mask, (0, 0), (n, mask.shape[1]))
        out_mel.append(jnp.pad(mel_n, ((0, 0), (0, pad), (0, 0))))
        out_mask.append(jnp.pad(mask_n, ((0, 0), (0, pad))))
    return jnp.concatenate(out_mel, axis=0), jnp.concatenate(out_mask, axis=0)


def _start_d2h(x) -> None:
    """Begin an async device->host copy (no-op for non-device arrays)."""
    try:
        x.copy_to_host_async()
    except AttributeError:
        pass


class SynthesisEngine:
    """Owns jitted programs + parameters for one (voice, vocoder) pair."""

    def __init__(
        self,
        glow_params,
        glow_cfg: GlowTTSConfig,
        audio_settings: AudioSettings,
        vocoder_kind: str = "griffin_lim",  # "hifi_gan" | "griffin_lim"
        vocoder_params=None,
        vocoder_cfg: typing.Optional[HiFiGanConfig] = None,
        policy: typing.Optional[BucketPolicy] = None,
        half: bool = False,
        vocoder_half: typing.Optional[bool] = None,
        seed: int = 1234,
        griffin_lim_iters: int = 60,
        griffin_lim_momentum: typing.Optional[float] = None,
        waveglow_sigma: float = 0.9,
        use_pallas: typing.Optional[bool] = None,
        mesh: typing.Optional["jax.sharding.Mesh"] = None,
    ):
        _enable_persistent_compile_cache()
        if use_pallas is None:
            use_pallas = default_use_pallas()
        self.use_pallas = use_pallas
        # Data-parallel serving mesh: batch rows shard over the "data" axis
        # (the natural multi-chip axis for this model family — sentences are
        # independent; SURVEY.md §2.4).  None = single-device.
        self.mesh = mesh
        self._n_data = int(mesh.shape["data"]) if mesh is not None else 1
        self.glow_cfg = glow_cfg
        self.audio_settings = audio_settings
        self.vocoder_kind = vocoder_kind
        self.vocoder_cfg = vocoder_cfg
        self.policy = policy or BucketPolicy(n_sqz=glow_cfg.n_sqz)
        self.seed = seed
        self.half = half
        # Mixed precision: the flow decoder's iterative reverse path keeps
        # f32 accuracy for the mel, while the HiFi-GAN stack — tanh-bounded
        # and conv-dominated — runs bfloat16 on the MXU at 2x the rate.
        # None = production default: bf16 when ``half`` asks for it OR when
        # running on a TPU backend (see default_vocoder_half).
        self.vocoder_half = (
            vocoder_half
            if vocoder_half is not None
            else (half or default_vocoder_half())
        )
        self.griffin_lim_iters = griffin_lim_iters
        self.waveglow_sigma = waveglow_sigma
        if griffin_lim_momentum is None:
            # Fast Griffin-Lim (Perraudin et al.) converges much closer to
            # the target magnitudes at the same iteration count; plain
            # iteration (0.0) only matters for exact reference parity
            griffin_lim_momentum = float(
                os.environ.get("LARYNX_TPU_GL_MOMENTUM", "0.99")
            )
        self.griffin_lim_momentum = griffin_lim_momentum
        self._lock = threading.Lock()
        # Predictive decode-bucket state: upper-bound estimate of mel
        # frames per input token, learned from observed batches (see
        # synthesize_launch_predicted).  0.0 = no observation yet.
        self._frames_per_token = 0.0
        self._bucket_mispredicts = 0
        # route counter for the single-utterance time-sharded vocode
        # (tests pin that the length gate picks the right path)
        self._time_shard_hits = 0
        self._grid_shard_hits = 0

        self.dtype = jnp.bfloat16 if half else jnp.float32
        self.voc_dtype = jnp.bfloat16 if self.vocoder_half else jnp.float32
        cast = lambda t, dtype: jax.tree.map(  # noqa: E731
            # probe the dtype WITHOUT materializing the leaf on device
            # (jnp.asarray(x).dtype would upload every weight twice)
            lambda x: jnp.asarray(
                x,
                dtype
                if jnp.issubdtype(jnp.result_type(x), jnp.floating)
                else None,
            ),
            t,
        )
        self.glow_params = cast(glow_params, self.dtype)
        self.vocoder_params = (
            cast(vocoder_params, self.voc_dtype) if vocoder_params else None
        )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(mesh, PartitionSpec())
            self.glow_params = jax.device_put(self.glow_params, replicated)
            if self.vocoder_params is not None:
                self.vocoder_params = jax.device_put(
                    self.vocoder_params, replicated
                )

        if vocoder_kind == "hifi_gan":
            assert vocoder_cfg is not None and vocoder_params is not None
            self.upsample = vocoder_cfg.total_upsample
        elif vocoder_kind == "waveglow":
            assert vocoder_cfg is not None and vocoder_params is not None
            self.upsample = vocoder_cfg.upsample_stride
        elif vocoder_kind == "none":
            self.upsample = audio_settings.hop_length
        else:
            self.upsample = audio_settings.hop_length
            self._gl_basis = jnp.asarray(
                make_mel_basis(
                    audio_settings.sample_rate,
                    audio_settings.filter_length,
                    audio_settings.mel_channels,
                    audio_settings.mel_fmin,
                    audio_settings.mel_fmax,
                )
            )

        self._bias_spec = None  # lazy denoiser bias (hifi_gan only)
        self._build_programs()

    # ------------------------------------------------------------------
    # program construction

    def _build_programs(self):
        cfg = self.glow_cfg
        settings = self.audio_settings

        def encode_fn(params, ids, lengths, length_scale, g=None):
            return glow_model.encode(
                params, cfg, ids, lengths, length_scale=length_scale, g=g
            )

        self._encode = jax.jit(encode_fn)

        @jax.jit
        def speaker_fn(params, speaker_ids):
            return glow_model.speaker_embedding(params, speaker_ids)

        self._speaker = speaker_fn

        @functools.partial(jax.jit, static_argnames=("mel_max",))
        def decode_fn(params, x_m, x_logs, w_ceil, y_lengths, key, noise_scale,
                      mel_max, g=None):
            mel, z_mask = glow_model.expand_and_decode(
                params, cfg, x_m, x_logs, w_ceil, y_lengths, key,
                mel_max_length=mel_max, noise_scale=noise_scale, g=g,
            )
            return mel, z_mask

        self._decode = decode_fn

        @functools.partial(jax.jit, static_argnames=("mel_max",))
        def encode_decode_fn(params, ids, lengths, length_scale, key,
                             noise_scale, mel_max, g=None):
            """Fused encode + flow decode: ONE dispatch round trip.

            Both stages are small-kernel dispatch-bound programs through
            the remote tunnel (~24 ms/dispatch, CLAUDE.md phase table)
            with no device->host decision between them once the mel
            bucket is predicted — unlike decode+vocode fusion, which
            lost to the D2H overlap (see synthesize_launch).  The encode
            outputs are returned too so a bucket mispredict can
            redispatch just the decode.
            """
            enc = glow_model.encode(
                params, cfg, ids, lengths, length_scale=length_scale, g=g
            )
            x_m, x_logs, _logw, w_ceil, y_lengths, _mask = enc
            mel, z_mask = glow_model.expand_and_decode(
                params, cfg, x_m, x_logs, w_ceil, y_lengths, key,
                mel_max_length=mel_max, noise_scale=noise_scale, g=g,
            )
            return mel, z_mask, enc

        self._encode_decode = encode_decode_fn

        engine_seed = self.seed

        @functools.partial(jax.jit, static_argnames=("mel_max",))
        def decode_rowseed_fn(params, x_m, x_logs, w_ceil, y_lengths,
                              row_seeds, seeded_mask, batch_index,
                              noise_scale, mel_max, g=None):
            """Decode with per-row noise keys: an explicitly-seeded row's
            key comes ONLY from its seed (legacy PRNGKey bit layout), an
            unseeded row's from (engine seed, batch counter, row) — so
            seeded rows reproduce regardless of batch composition or
            server history (runtime/scheduler.py batches them)."""
            b = x_m.shape[0]
            anon_base = jax.random.fold_in(
                jax.random.PRNGKey(engine_seed), batch_index
            )

            def row_key(seeded, s, r):
                user = jnp.stack([jnp.uint32(0), s])  # == PRNGKey(s), s<2^32
                anon = jax.random.fold_in(anon_base, r)
                return jnp.where(seeded, user, anon)

            row_keys = jax.vmap(row_key)(
                seeded_mask, row_seeds, jnp.arange(b, dtype=jnp.uint32)
            )
            mel, z_mask = glow_model.expand_and_decode(
                params, cfg, x_m, x_logs, w_ceil, y_lengths, None,
                mel_max_length=mel_max, noise_scale=noise_scale, g=g,
                row_keys=row_keys,
            )
            return mel, z_mask

        self._decode_rowseed = decode_rowseed_fn

        def postprocess(mel, z_mask):
            # [B, M, C] -> [B, C, M] denorm chain, silence in padded frames
            mel_cm = jnp.swapaxes(mel.astype(jnp.float32), 1, 2)
            mel_pp = dspmel.mel_postprocess(mel_cm, settings)
            return jnp.where(z_mask[:, None, :] > 0, mel_pp, SILENCE_LOG_MEL)

        def to_int16(audio, n_valid):
            """Peak-normalize + int16 on device over the valid samples only
            (matches audio_float_to_int16 on the host-cropped array);
            halves the bytes crossing the (slow) host link."""
            t = audio.shape[-1]
            sample_mask = (
                jnp.arange(t)[None, :] < n_valid[:, None]
            )
            masked = jnp.where(sample_mask, jnp.abs(audio), 0.0)
            peak = jnp.maximum(jnp.max(masked, axis=-1, keepdims=True), 0.01)
            scaled = jnp.clip(audio * (32767.0 / peak), -32767.0, 32767.0)
            return scaled.astype(jnp.int16)

        if self.vocoder_kind == "hifi_gan":
            voc_cfg = self.vocoder_cfg

            use_pallas = self.use_pallas
            upsample = voc_cfg.total_upsample
            fft = settings.filter_length
            hop = settings.hop_length

            def vocode_body(voc_params, mel, z_mask, bias_spec, strength, denoise):
                mel_pp = postprocess(mel, z_mask)  # [B, C, M]
                audio = hifi_model.generator(
                    voc_params,
                    voc_cfg,
                    jnp.swapaxes(mel_pp.astype(self.voc_dtype), 1, 2),
                    use_pallas=use_pallas,
                ).astype(jnp.float32)
                y_len = jnp.sum(z_mask, axis=1, dtype=jnp.int32)
                n_valid = y_len * upsample
                if denoise:
                    audio = hifi_denoiser.denoise(
                        audio, bias_spec, strength, fft, hop
                    )
                    # denoised length per row: frames(n_valid) * hop + fft
                    nf = jnp.maximum(n_valid - fft, 0)
                    nf = -(-nf // hop)
                    n_valid = nf * hop + fft
                return to_int16(audio, n_valid)

            if self.mesh is None:
                self._vocode = jax.jit(
                    vocode_body, static_argnames=("denoise",)
                )
            else:
                # Pallas calls are not auto-partitionable; shard_map splits
                # the batch rows over the data axis (rows are independent)
                # and each device runs the identical local program.
                from jax.sharding import PartitionSpec as P

                def sharded_vocode(denoise: bool):
                    body = functools.partial(vocode_body, denoise=denoise)
                    return jax.jit(
                        jax.shard_map(
                            body,
                            mesh=self.mesh,
                            in_specs=(
                                P(), P("data"), P("data"), P(), P("data"),
                            ),
                            out_specs=P("data"),
                            check_vma=False,
                        )
                    )

                variants = {d: sharded_vocode(d) for d in (False, True)}
                self._vocode = (
                    lambda p, mel, zm, bias, s, denoise: variants[
                        bool(denoise)
                    ](p, mel, zm, bias, s)
                )
                # single-row batches gain nothing from row sharding —
                # split ONE utterance's vocode along time instead
                # (parallel/time_shard.py; matches the batched
                # program via the streaming receptive-field halo)
                from larynx_tpu.parallel.time_shard import (
                    make_time_sharded_vocode,
                )

                ts_halo = stream_halo_frames(voc_cfg)
                self._vocode_time_sharded = make_time_sharded_vocode(
                    voc_cfg,
                    settings,
                    self.mesh,
                    halo=ts_halo,
                    axis="data",
                    # shard_map runs the LOCAL program per device, so the
                    # Pallas calls are fine here (it is GSPMD auto
                    # partitioning they are opaque to)
                    use_pallas=use_pallas,
                    voc_dtype=self.voc_dtype,
                )
                # Minimum mel width for the time-shard route.  The
                # documented model (parallel/time_shard.py) gives
                # speedup(M) = M / (M/N + 2*halo): break-even is
                # M = 2*halo*N/(N-1) (~82 frames at N=8, halo=36), but
                # shard_map dispatch overhead eats small wins, so gate at
                # 2*N*halo (predicted speedup N/2) — shorter utterances
                # take the row-sharded group path, where device 0 runs
                # the one real row at plain single-device latency with no
                # halo tax.
                self._time_shard_min_frames = int(
                    os.environ.get(
                        "LARYNX_TPU_TIME_SHARD_MIN_FRAMES",
                        2 * self._n_data * ts_halo,
                    )
                )
                # composed rows x time grids for 1 < n_valid < n_data:
                # row-shard across ceil-divide row groups and time-shard
                # within, so every device holds real work instead of five
                # chips re-vocoding padding on a 3-row batch.  Built
                # lazily per (n_rows, n_time) and cached.
                self._ts_halo = ts_halo
                self._grid_fns = {}

                def build_grid(n_rows: int, n_time: int):
                    from larynx_tpu.parallel.time_shard import (
                        make_grid_sharded_vocode,
                    )

                    return make_grid_sharded_vocode(
                        voc_cfg,
                        settings,
                        list(self.mesh.devices.flat),
                        n_rows,
                        n_time,
                        halo=ts_halo,
                        use_pallas=use_pallas,
                        voc_dtype=self.voc_dtype,
                    )

                self._build_grid_vocode = build_grid

            @functools.partial(
                jax.jit, static_argnames=("window", "denoise")
            )
            def vocode_stream_fn(
                voc_params, mel, z_mask, start, window, bias_spec,
                strength, denoise,
            ):
                """One haloed chunk at FIXED gain (no per-utterance peak
                normalization — tanh already bounds the generator), sliced
                on device so one program serves every chunk position."""
                mel_c = jax.lax.dynamic_slice_in_dim(mel, start, window, 1)
                mask_c = jax.lax.dynamic_slice_in_dim(z_mask, start, window, 1)
                mel_pp = postprocess(mel_c, mask_c)
                audio = hifi_model.generator(
                    voc_params,
                    voc_cfg,
                    jnp.swapaxes(mel_pp.astype(self.voc_dtype), 1, 2),
                    use_pallas=use_pallas,
                ).astype(jnp.float32)
                if denoise:
                    audio = hifi_denoiser.denoise(
                        audio, bias_spec, strength, fft, hop
                    )
                    # the denoiser's un-normalized Hann^2 overlap-add
                    # multiplies the waveform by sum(w^2)/hop (~1.4985 at
                    # 1024/256); the batch path absorbs it in per-row peak
                    # normalization, the fixed-gain stream must divide it
                    # out or loud samples hard-clip
                    ola_gain = float(
                        np.sum(dsp.hann_window(fft) ** 2) / hop
                    )
                    audio = audio / ola_gain
                scaled = jnp.clip(audio * 32767.0, -32767.0, 32767.0)
                return scaled.astype(jnp.int16)

            self._vocode_stream = vocode_stream_fn

            @jax.jit
            def bias_audio_fn(voc_params):
                zeros = jnp.zeros(
                    (1, hifi_denoiser.BIAS_MEL_FRAMES, voc_cfg.num_mels),
                    dtype=self.voc_dtype,
                )
                audio = hifi_model.generator(voc_params, voc_cfg, zeros)
                return hifi_denoiser.compute_bias_spec(
                    audio.astype(jnp.float32),
                    settings.filter_length,
                    settings.hop_length,
                )

            self._bias_audio_fn = bias_audio_fn

        elif self.vocoder_kind == "waveglow":
            voc_cfg = self.vocoder_cfg

            from larynx_tpu.models.waveglow import model as wg_model

            # fused Pallas WN layers (ops/wn_layer.py): DEFAULT on TPU.
            # Measured vs XLA (v5e, bf16, state-fused kernel): 1.99x at
            # 1x4096 / 2x2048, 1.93x at 4x1024, 1.14x at 8x512 — every
            # engine group geometry under the area cap wins.  The mesh
            # path stays XLA (pallas_call is opaque to GSPMD row
            # partitioning), as do lane-unaligned geometries.
            # LARYNX_TPU_WAVEGLOW_PALLAS=0 forces XLA; any other value
            # forces the kernel on.
            from larynx_tpu.ops.wn_layer import supports_geometry

            wg_env = (
                os.environ.get("LARYNX_TPU_WAVEGLOW_PALLAS", "")
                .strip()
                .lower()
            )
            wg_supported = (
                self.use_pallas
                and self.mesh is None
                and supports_geometry(
                    voc_cfg.wn_channels,
                    voc_cfg.mel_channels * voc_cfg.groups,
                )
            )
            if wg_env in ("0", "false", "off", "no"):
                wg_pallas = False
            elif wg_env:
                wg_pallas = self.use_pallas and self.mesh is None
            else:
                wg_pallas = wg_supported

            wg_fft = settings.filter_length
            wg_hop = settings.hop_length

            @functools.partial(jax.jit, static_argnames=("denoise",))
            def vocode_wg(
                voc_params, mel, z_mask, z, bias_spec, strength, denoise
            ):
                """``z`` is the pre-drawn, pre-scaled prior noise
                [rows, blocks, groups] — drawn once for the WHOLE batch by
                the caller so a row's audio is (up to padded-tail edge
                effects) independent of how the batch was split into
                vocode groups."""
                mel_pp = postprocess(mel, z_mask)  # [B, C, M]
                audio = wg_model.infer(
                    voc_params,
                    voc_cfg,
                    jnp.swapaxes(mel_pp, 1, 2).astype(self.voc_dtype),
                    z=z.astype(self.voc_dtype),
                    use_pallas=wg_pallas,
                ).astype(jnp.float32)
                y_len = jnp.sum(z_mask, axis=1, dtype=jnp.int32)
                n_valid = y_len * voc_cfg.upsample_stride
                if denoise:
                    # same bias spectral subtraction as HiFi-GAN — the
                    # reference denoiser contract is per-vocoder-output,
                    # not HiFi-specific (larynx/hifi_gan.py:171-203;
                    # NVIDIA's WaveGlow ships the identical Denoiser)
                    audio = hifi_denoiser.denoise(
                        audio, bias_spec, strength, wg_fft, wg_hop
                    )
                    nf = jnp.maximum(n_valid - wg_fft, 0)
                    nf = -(-nf // wg_hop)
                    n_valid = nf * wg_hop + wg_fft
                return to_int16(audio, n_valid)

            self._vocode_gl = vocode_wg  # shares the non-hifi vocode slot

            if self.mesh is not None:
                # rows x time grid for partial mesh batches, WaveGlow
                # flavor: the halo must cover the flows' chained WN
                # receptive field (~100 frames at wn_256 — an order
                # beyond HiFi's 36), so the plan only fires at long mels
                from larynx_tpu.parallel.time_shard import (
                    make_waveglow_grid_vocode,
                    waveglow_halo_frames,
                )

                self._wg_halo_frames = waveglow_halo_frames(voc_cfg)
                self._wg_grid_fns = {}

                def build_wg_grid(n_rows: int, n_time: int):
                    return make_waveglow_grid_vocode(
                        voc_cfg,
                        settings,
                        list(self.mesh.devices.flat),
                        n_rows,
                        n_time,
                        halo=self._wg_halo_frames,
                        voc_dtype=self.voc_dtype,
                    )

                self._build_wg_grid_vocode = build_wg_grid

            @jax.jit
            def wg_bias_audio_fn(voc_params):
                # zero mel + ZERO prior noise: the bias signature must be
                # deterministic (sigma=0, exactly NVIDIA's Denoiser mode)
                frames = hifi_denoiser.BIAS_MEL_FRAMES
                zeros_mel = jnp.zeros(
                    (1, frames, voc_cfg.mel_channels), dtype=self.voc_dtype
                )
                blocks = frames * voc_cfg.upsample_stride // voc_cfg.groups
                zeros_z = jnp.zeros(
                    (1, blocks, voc_cfg.groups), dtype=self.voc_dtype
                )
                audio = wg_model.infer(
                    voc_params, voc_cfg, zeros_mel, z=zeros_z,
                    use_pallas=wg_pallas,
                )
                return hifi_denoiser.compute_bias_spec(
                    audio.astype(jnp.float32), wg_fft, wg_hop
                )

            self._bias_audio_fn = wg_bias_audio_fn

        elif self.vocoder_kind == "none":
            pass  # encode/decode only (phonemes_to_mels surface)
        else:
            gl_iters = self.griffin_lim_iters
            gl_momentum = self.griffin_lim_momentum

            fft = settings.filter_length
            hop = settings.hop_length

            @jax.jit
            def vocode_fn(_unused, mel, z_mask, key):
                mel_pp = postprocess(mel, z_mask)  # [B, C, M]
                spec = dspmel.linear_from_mel(mel_pp, self._gl_basis, 1000.0)
                spec = spec[:, :, :-1]
                signal = dsp.griffin_lim(
                    spec, key, fft, hop, gl_iters, momentum=gl_momentum
                )
                y_len = jnp.sum(z_mask, axis=1, dtype=jnp.int32)
                nf = jnp.maximum(y_len - 1, 1)
                n_valid = nf * hop + fft
                return to_int16(signal, n_valid)

            self._vocode_gl = vocode_fn

    # ------------------------------------------------------------------
    # public API

    def encode_batch(
        self,
        id_seqs: typing.Sequence[np.ndarray],
        length_scale: typing.Union[float, typing.Sequence[float]] = 1.0,
        speaker_ids: typing.Optional[typing.Sequence[int]] = None,
    ):
        """Blocking encode: (device outputs, y_lengths np, g)."""
        out, g = self.encode_launch(
            id_seqs, length_scale, speaker_ids=speaker_ids
        )
        return out, np.asarray(out[4]), g

    @staticmethod
    def _row_values(value, b_bucket: int) -> np.ndarray:
        """Scalar or per-row sequence -> [b_bucket] f32 vector, padding
        rows filled with the last given value."""
        arr = np.empty((b_bucket,), dtype=np.float32)
        if np.ndim(value) == 0:
            arr[:] = float(value)
        else:
            value = np.asarray(value, dtype=np.float32)
            arr[: len(value)] = value
            arr[len(value):] = value[-1] if len(value) else 0.0
        return arr

    @staticmethod
    def _row_param(value, b_bucket: int, ndim: int) -> jnp.ndarray:
        """Scalar or per-row sequence -> [b_bucket, 1, ...] f32 array.

        Synthesis knobs (length/noise scale, denoiser strength) are
        per-ROW so the scheduler can coalesce requests that differ only in
        settings into one device batch.
        """
        arr = SynthesisEngine._row_values(value, b_bucket)
        return jnp.asarray(arr.reshape((b_bucket,) + (1,) * (ndim - 1)))

    def encode_launch(
        self,
        id_seqs: typing.Sequence[np.ndarray],
        length_scale: typing.Union[float, typing.Sequence[float]] = 1.0,
        speaker_ids: typing.Optional[typing.Sequence[int]] = None,
    ):
        """Non-blocking encode dispatch.

        Returns (device outputs, g) with the y_lengths device->host copy
        already started; resolve it later with ``np.asarray(out[4])``.
        Dispatch round trips through the remote TPU tunnel cost tens of
        ms, so launching every group's encode before syncing any of them
        hides most of that latency (multi-voice SSML documents).
        """
        ids_dev, lengths_dev, b_bucket = self._pad_id_batch(id_seqs)
        g = self._speaker_embedding(speaker_ids, b_bucket)
        out = self._encode(
            self.glow_params, ids_dev, lengths_dev,
            self._row_param(length_scale, b_bucket, 2), g,
        )
        _start_d2h(out[4])
        return out, g

    def _pad_id_batch(self, id_seqs):
        """Pad id sequences to (text, batch) buckets; returns device
        arrays (mesh-sharded when serving on one) + the batch bucket."""
        n = len(id_seqs)
        t_bucket = self.policy.text_bucket(max(len(s) for s in id_seqs))
        b_bucket = self.policy.batch_bucket(n)
        if self._n_data > 1:
            b_bucket = -(-b_bucket // self._n_data) * self._n_data

        ids = np.zeros((b_bucket, t_bucket), dtype=np.int32)
        lengths = np.zeros((b_bucket,), dtype=np.int32)
        for i, seq in enumerate(id_seqs):
            ids[i, : len(seq)] = seq
            lengths[i] = len(seq)
        lengths[n:] = 1

        ids_dev, lengths_dev = jnp.asarray(ids), jnp.asarray(lengths)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ids_dev = jax.device_put(
                ids_dev, NamedSharding(self.mesh, P("data", None))
            )
            lengths_dev = jax.device_put(
                lengths_dev, NamedSharding(self.mesh, P("data"))
            )
        return ids_dev, lengths_dev, b_bucket

    def encode_decode_launch_predicted(
        self,
        id_seqs: typing.Sequence[np.ndarray],
        length_scale: typing.Union[float, typing.Sequence[float]] = 1.0,
        speaker_ids: typing.Optional[typing.Sequence[int]] = None,
        noise_scale: float = 0.667,
        batch_index: int = 0,
    ):
        """ONE dispatch for encode + flow decode at the predicted mel
        bucket, or None when the fused path does not apply (mesh mode,
        cold frames-per-token estimator, or LARYNX_TPU_FUSED_ENCODE=0) —
        callers then fall back to encode_launch + decode_launch_predicted.

        Returns (mel, z_mask, key, y_lengths, g) with ``y_lengths``
        resolved on host.  A bucket mispredict redispatches only the
        decode at the exact bucket (the fused program also returns the
        encoder outputs), counted in ``_bucket_mispredicts``.
        """
        max_id_len = max((len(s) for s in id_seqs), default=0)
        if (
            self.mesh is not None
            or self._frames_per_token <= 0.0
            or max_id_len <= 0
            or not fused_encode_enabled()
        ):
            return None
        ls = self._length_scale_max(length_scale)
        bucket = self._predict_mel_bucket(max_id_len, ls)

        ids_dev, lengths_dev, b_bucket = self._pad_id_batch(id_seqs)
        g = self._speaker_embedding(speaker_ids, b_bucket)
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed), batch_index
        )
        mel, z_mask, enc_out = self._encode_decode(
            self.glow_params, ids_dev, lengths_dev,
            self._row_param(length_scale, b_bucket, 2),
            key, self._row_param(noise_scale, b_bucket, 3), bucket, g,
        )
        _start_d2h(enc_out[4])
        y_lengths = np.asarray(enc_out[4])
        n = len(id_seqs)
        actual = int(y_lengths[:n].max())
        self._observe_frames_per_token(actual, max_id_len, ls)
        if actual > bucket:
            self._bucket_mispredicts += 1
            mel, z_mask, key = self.decode_launch(
                enc_out, y_lengths, g, n,
                noise_scale=noise_scale, batch_index=batch_index,
            )
        return mel, z_mask, key, y_lengths, g

    def _speaker_embedding(self, speaker_ids, b_bucket):
        """[B] speaker indices -> normalized [B, gin] embeddings (or None
        for single-speaker voices)."""
        if speaker_ids is None or "emb_g" not in self.glow_params:
            return None
        idx = np.zeros((b_bucket,), dtype=np.int32)
        idx[: len(speaker_ids)] = np.asarray(speaker_ids, dtype=np.int32)
        return self._speaker(self.glow_params, jnp.asarray(idx))

    def decode_launch(
        self,
        enc_out,
        y_lengths: np.ndarray,
        g,
        n: int,
        noise_scale: float = 0.667,
        seed: typing.Optional[int] = None,
        batch_index: int = 0,
        row_seeds: typing.Optional[
            typing.Sequence[typing.Optional[int]]
        ] = None,
        mel_bucket_override: typing.Optional[int] = None,
    ):
        """Non-blocking flow-decoder dispatch -> (mel, z_mask, key).

        ``row_seeds`` (one entry per sentence; None = unseeded) switches
        to per-row noise keys: a seeded row's latent noise depends only
        on its own seed, so seeded requests can share a batch and stay
        reproducible.  Mutually exclusive with the scalar ``seed``.
        """
        x_m, x_logs, _logw, w_ceil, y_lengths_dev, _mask = enc_out
        mel_bucket = (
            mel_bucket_override
            if mel_bucket_override is not None
            else self.policy.mel_bucket(int(y_lengths[:n].max()))
        )
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed if seed is None else seed), batch_index
        )
        if row_seeds is not None:
            b = x_m.shape[0]
            seeds = np.zeros((b,), dtype=np.uint32)
            mask = np.zeros((b,), dtype=bool)
            for r, s in enumerate(row_seeds[:b]):
                if s is not None:
                    seeds[r] = np.uint32(int(s) & 0xFFFFFFFF)
                    mask[r] = True
            mel, z_mask = self._decode_rowseed(
                self.glow_params, x_m, x_logs, w_ceil, y_lengths_dev,
                jnp.asarray(seeds), jnp.asarray(mask),
                jnp.uint32(batch_index),
                self._row_param(noise_scale, b, 3), mel_bucket, g,
            )
            return mel, z_mask, key
        mel, z_mask = self._decode(
            self.glow_params, x_m, x_logs, w_ceil, y_lengths_dev,
            key, self._row_param(noise_scale, x_m.shape[0], 3), mel_bucket, g,
        )
        return mel, z_mask, key

    def synthesize_launch(
        self,
        enc_out,
        y_lengths: np.ndarray,
        g,
        n: int,
        noise_scale: float = 0.667,
        seed: typing.Optional[int] = None,
        batch_index: int = 0,
        denoiser_strength: float = 0.0,
        row_seeds: typing.Optional[
            typing.Sequence[typing.Optional[int]]
        ] = None,
    ) -> typing.Tuple[typing.List[typing.Any], int]:
        """Non-blocking decode+vocode dispatch -> (parts, batch rows).

        Negative result (kept as documentation): fusing flow decode +
        vocoder into ONE jitted program to halve dispatch round trips was
        measured in-process A/B on the TPU and LOST — SSML workload 1.3x
        slower (median RTF 0.0070 vs 0.0054: the two-step path overlaps
        one group's vocode D2H with the next group's decode), server
        workload dead even (0.00135 both) with a much worse cold start
        (first-request p50 42 s vs 1.5 s from compiling the large fused
        program per bucket).  Two dispatches it is.
        """
        mel, z_mask, key = self.decode_launch(
            enc_out, y_lengths, g, n,
            noise_scale=noise_scale, seed=seed, batch_index=batch_index,
            row_seeds=row_seeds,
        )
        parts = self.vocode_launch(
            mel, z_mask, n, denoiser_strength, key, y_lengths=y_lengths
        )
        return parts, mel.shape[0]

    def synthesize_launch_predicted(
        self,
        enc_out,
        g,
        n: int,
        max_id_len: int,
        noise_scale: float = 0.667,
        length_scale: typing.Union[float, typing.Sequence[float]] = 1.0,
        seed: typing.Optional[int] = None,
        batch_index: int = 0,
        denoiser_strength: float = 0.0,
        row_seeds: typing.Optional[
            typing.Sequence[typing.Optional[int]]
        ] = None,
    ):
        """Predictive decode + vocode dispatch (see
        :meth:`decode_launch_predicted` for the prediction mechanics).

        Returns (parts, batch_rows, y_lengths).
        """
        mel, z_mask, key, y_lengths = self.decode_launch_predicted(
            enc_out, g, n,
            max_id_len=max_id_len,
            noise_scale=noise_scale, length_scale=length_scale,
            seed=seed, batch_index=batch_index, row_seeds=row_seeds,
        )
        parts = self.vocode_launch(
            mel, z_mask, n, denoiser_strength, key, y_lengths=y_lengths
        )
        return parts, mel.shape[0], y_lengths

    @staticmethod
    def _length_scale_max(
        length_scale: typing.Union[float, typing.Sequence[float]]
    ) -> float:
        """Largest per-row length scale, floored away from zero.

        The learned frames-per-token ratio is per TOKEN at length_scale
        1.0: a request's length_scale multiplies durations linearly, so
        it divides out of the observation and multiplies back into the
        prediction — otherwise one lengthScale=2 request would poison
        the estimator (oversized buckets + a fresh XLA compile) for ~70
        batches."""
        try:
            ls = float(max(length_scale))  # type: ignore[arg-type]
        except TypeError:
            ls = float(length_scale)
        return max(ls, 1e-6)

    def _predict_mel_bucket(self, max_id_len: int, ls: float) -> int:
        """Mel bucket from the learned frames-per-token upper bound
        (+15% safety margin) — shared by the two-step and fused
        predicted paths so their buckets never diverge."""
        pred_frames = int(
            math.ceil(max_id_len * self._frames_per_token * ls * 1.15)
        )
        return self.policy.mel_bucket(pred_frames)

    def _observe_frames_per_token(
        self, actual: int, max_id_len: int, ls: float
    ) -> None:
        """Update the estimator: jump to a new maximum immediately
        (upper bound), decay toward smaller observations slowly."""
        if max_id_len <= 0:
            return
        obs = actual / (max_id_len * ls)
        self._frames_per_token = (
            obs
            if obs > self._frames_per_token
            else 0.99 * self._frames_per_token + 0.01 * obs
        )

    def decode_launch_predicted(
        self,
        enc_out,
        g,
        n: int,
        max_id_len: int,
        noise_scale: float = 0.667,
        length_scale: typing.Union[float, typing.Sequence[float]] = 1.0,
        seed: typing.Optional[int] = None,
        batch_index: int = 0,
        row_seeds: typing.Optional[
            typing.Sequence[typing.Optional[int]]
        ] = None,
    ):
        """Decode without waiting for the y_lengths device->host sync.

        The only host decision the decode dispatch needs is the mel
        BUCKET; the per-row lengths live on device (``y_lengths_dev``)
        and mask correctly at any bucket >= the true maximum.  So we
        predict the bucket from a learned frames-per-token upper bound,
        dispatch immediately, and resolve the exact lengths WHILE the
        decode runs — the ~30 ms tunnel round trip (see CLAUDE.md phase
        breakdown) overlaps device compute instead of preceding it.  A
        misprediction (true max exceeds the predicted bucket) costs one
        discarded decode and a redispatch at the exact bucket; the
        estimator is deliberately an upper bound so this is rare.

        Returns (mel, z_mask, key, y_lengths) with ``y_lengths`` already
        resolved on host (the copy overlapped the decode dispatch).
        """
        ls = self._length_scale_max(length_scale)
        decoded = None
        bucket = 0
        # prediction changes the decode program's noise SHAPE, so a
        # wider-than-exact bucket yields a different (equally valid)
        # noise draw.  Explicitly seeded requests promise bit
        # reproducibility and take the exact-bucket path.
        if (
            self._frames_per_token > 0.0
            and max_id_len > 0
            and row_seeds is None
            and seed is None
        ):
            bucket = self._predict_mel_bucket(max_id_len, ls)
            decoded = self.decode_launch(
                enc_out, None, g, n,
                noise_scale=noise_scale, seed=seed, batch_index=batch_index,
                mel_bucket_override=bucket,
            )
        # resolves the copy started at encode_launch; overlaps the decode
        y_lengths = np.asarray(enc_out[4])
        actual = int(y_lengths[:n].max())
        self._observe_frames_per_token(actual, max_id_len, ls)
        if decoded is not None and actual <= bucket:
            mel, z_mask, key = decoded
        else:
            if decoded is not None:
                self._bucket_mispredicts += 1
            mel, z_mask, key = self.decode_launch(
                enc_out, y_lengths, g, n,
                noise_scale=noise_scale, seed=seed, batch_index=batch_index,
                row_seeds=row_seeds,
            )
        return mel, z_mask, key, y_lengths

    def vocode_launch(
        self,
        mel,
        z_mask,
        n_valid: int,
        denoiser_strength: float,
        key,
        y_lengths: typing.Optional[np.ndarray] = None,
    ) -> typing.List[typing.Any]:
        """Non-blocking vocode dispatch; returns (device part, row indices)
        pairs with their host copies already started (resolve with
        vocode_collect)."""
        if self.vocoder_kind == "hifi_gan":
            return self._vocode_launch_hifi(
                mel, z_mask, n_valid, denoiser_strength, y_lengths
            )
        if self.vocoder_kind == "waveglow":
            return self._vocode_launch_waveglow(
                mel, z_mask, n_valid, denoiser_strength, key, y_lengths
            )
        if self.vocoder_kind != "griffin_lim":
            raise RuntimeError(
                f"engine with vocoder_kind={self.vocoder_kind!r} cannot "
                "vocode (mel-only surface; use phonemes_to_mels)"
            )
        part = self._vocode_gl(
            self.vocoder_params, mel, z_mask, jax.random.fold_in(key, 1)
        )
        _start_d2h(part)
        return [(part, list(range(mel.shape[0])))]

    def _vocode_launch_waveglow(
        self, mel, z_mask, n_valid, denoiser_strength, key, y_lengths
    ):
        """Length-sorted ragged WaveGlow vocoding (sibling of the HiFi
        path at _vocode_launch_hifi — keep grouping conventions in sync).

        Valid rows sort by mel length and each power-of-two-sized group
        runs at ITS OWN bucketed frame width.  The rows*frames cap is a
        quarter of MAX_VOCODE_AREA: per (row, frame), WaveGlow keeps
        several [stride/groups, 2*wn_channels] WN buffers live
        (~0.25-0.5 MB at wn_256 vs HiFi's ~0.1 MB worst stage).

        The prior noise is drawn ONCE for the whole batch, masked to each
        row's valid blocks, and sliced per group — so a row's audio is
        independent of grouping up to the WN receptive field's view of
        the different padded tails (same order of effect as the HiFi
        ragged path; crops stay within a couple int16 steps).
        """
        cfg = self.vocoder_cfg
        b, m = mel.shape[0], mel.shape[1]
        area = max(64, waveglow_area())

        blocks_full = m * cfg.upsample_stride // cfg.groups
        blocks_per_frame = cfg.upsample_stride // cfg.groups
        z_full = self.waveglow_sigma * jax.random.normal(
            jax.random.fold_in(key, 1), (b, blocks_full, cfg.groups)
        )
        # zero the prior past each row's valid blocks: the padded tail is
        # then (near-)silence under any bucket width
        y_len = jnp.sum(z_mask, axis=1, dtype=jnp.int32)
        valid_blocks = (y_len * blocks_per_frame)[:, None]
        z_full = jnp.where(
            (jnp.arange(blocks_full)[None, :] < valid_blocks)[..., None],
            z_full,
            0.0,
        )

        denoise = bool(np.any(np.asarray(denoiser_strength) > 0))
        bias = self._get_bias_spec() if denoise else jnp.zeros((1, 1, 1))
        str_rows = self._row_values(denoiser_strength, b)

        if self.mesh is not None:
            if 1 <= n_valid < self._n_data:
                # rows x time grid (n_valid == 1 degenerates to a pure
                # time shard); the WaveGlow halo makes the plan decline
                # at short mels where the receptive-field tax loses
                plan = self._grid_vocode_plan(
                    n_valid, m, halo=self._wg_halo_frames, area=area
                )
                if plan is not None:
                    fn = self._wg_grid_fns.get(plan)
                    if fn is None:
                        fn = self._wg_grid_fns[plan] = (
                            self._build_wg_grid_vocode(*plan)
                        )
                    self._grid_shard_hits += 1
                    part = fn(
                        self.vocoder_params,
                        jax.lax.slice_in_dim(mel, 0, n_valid, axis=0),
                        jax.lax.slice_in_dim(z_mask, 0, n_valid, axis=0),
                        jax.lax.slice_in_dim(z_full, 0, n_valid, axis=0),
                        bias,
                        self._row_param(str_rows[:n_valid], n_valid, 3),
                        denoise,
                    )
                    _start_d2h(part)
                    return [(part, list(range(n_valid)))]
            # the vocode program is plain jit (pure XLA, so GSPMD
            # partitions it); same uniform grouping as the HiFi branch
            strength = self._row_param(str_rows, b, 3)
            return self._mesh_uniform_groups(
                b, m, n_valid, area,
                (mel, z_mask, z_full, strength),
                lambda mel_g, mask_g, z_g, str_g: self._vocode_gl(
                    self.vocoder_params, mel_g, mask_g, z_g,
                    bias, str_g, denoise,
                ),
            )

        if y_lengths is not None:
            lens = np.asarray(y_lengths)[:n_valid].astype(np.int64)
        else:
            lens = np.full((n_valid,), m, dtype=np.int64)
        order = np.argsort(-lens, kind="stable")
        if np.array_equal(order, np.arange(n_valid)) and n_valid == b:
            mel_s, mask_s, z_s = mel, z_mask, z_full
        else:
            idx = jnp.asarray(order.astype(np.int32))
            mel_s = jnp.take(mel, idx, axis=0)
            mask_s = jnp.take(z_mask, idx, axis=0)
            z_s = jnp.take(z_full, idx, axis=0)
        sorted_lens = lens[order]

        # denoised rows crop past y*up by the STFT tail (see HiFi launch)
        margin = (
            -(-self.audio_settings.filter_length // self.upsample)
            if denoise
            else 0
        )
        parts = []
        for start, rows, m_g in self._ragged_group_plan(
            sorted_lens, n_valid, m, area, margin=margin
        ):
            blocks_g = m_g * cfg.upsample_stride // cfg.groups
            mel_g = jax.lax.dynamic_slice(
                mel_s, (start, 0, 0), (rows, m_g, mel_s.shape[2])
            )
            mask_g = jax.lax.dynamic_slice(
                mask_s, (start, 0), (rows, m_g)
            )
            z_g = jax.lax.dynamic_slice(
                z_s, (start, 0, 0), (rows, blocks_g, cfg.groups)
            )
            str_g = self._row_param(
                str_rows[order[start : start + rows]], rows, 3
            )
            part = self._vocode_gl(
                self.vocoder_params, mel_g, mask_g, z_g,
                bias, str_g, denoise,
            )
            _start_d2h(part)
            parts.append((part, [int(i) for i in order[start : start + rows]]))
        return parts

    @staticmethod
    def vocode_collect(parts, b: int) -> typing.List[np.ndarray]:
        """Resolve vocode parts into per-row int16 arrays (original row
        order; rows vocoded at different ragged widths may differ in
        length — callers crop to the valid samples anyway)."""
        rows: typing.List[typing.Optional[np.ndarray]] = [None] * b
        for part, idxs in parts:
            arr = np.asarray(part)
            for j, i in enumerate(idxs):
                if i < b:
                    rows[i] = arr[j]
        return [
            r if r is not None else np.zeros((0,), np.int16) for r in rows
        ]

    def crop_rows(
        self,
        audio_rows: typing.Sequence[np.ndarray],
        y_lengths: np.ndarray,
        n: int,
        denoiser_strength: float,
    ) -> typing.List[np.ndarray]:
        """Per-sentence valid-sample crops of vocode_collect's rows."""
        # denoising is a batch-static jit flag: any positive row strength
        # means every row went through the STFT round trip (same lengths)
        denoised = bool(np.any(np.asarray(denoiser_strength) > 0))
        out: typing.List[np.ndarray] = []
        for i in range(n):
            frames = int(y_lengths[i])
            if self.vocoder_kind in ("hifi_gan", "waveglow"):
                n_samples = frames * self.upsample
                if denoised and self.vocoder_kind in (
                    "hifi_gan", "waveglow"
                ):
                    nf = dsp.num_frames(
                        n_samples,
                        self.audio_settings.filter_length,
                        self.audio_settings.hop_length,
                    )
                    n_samples = (
                        nf * self.audio_settings.hop_length
                        + self.audio_settings.filter_length
                    )
            else:
                # Griffin-Lim output: (frames-1) usable spectrogram frames
                nf = max(frames - 1, 1)
                n_samples = (
                    nf * self.audio_settings.hop_length
                    + self.audio_settings.filter_length
                )
            n_samples = min(n_samples, audio_rows[i].shape[-1])
            out.append(np.ascontiguousarray(audio_rows[i][:n_samples]))
        return out

    def synthesize_batch(
        self,
        id_seqs: typing.Sequence[np.ndarray],
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        seed: typing.Optional[int] = None,
        denoiser_strength: float = 0.0,
        batch_index: int = 0,
        speaker_ids: typing.Optional[typing.Sequence[int]] = None,
    ) -> typing.List[np.ndarray]:
        """Synthesize a group of sentences (same text bucket) to int16 audio."""
        import time

        n = len(id_seqs)
        trace = _LOGGER.isEnabledFor(logging.DEBUG)
        t0 = time.perf_counter() if trace else 0.0
        fused = (
            self.encode_decode_launch_predicted(
                id_seqs, length_scale, speaker_ids=speaker_ids,
                noise_scale=noise_scale, batch_index=batch_index,
            )
            if seed is None
            else None
        )
        t1 = time.perf_counter() if trace else 0.0
        if fused is not None:
            mel, z_mask, key, y_lengths, _g = fused
            parts = self.vocode_launch(
                mel, z_mask, n, denoiser_strength, key,
                y_lengths=y_lengths,
            )
            b_rows = mel.shape[0]
        else:
            enc_out, g = self.encode_launch(
                id_seqs, length_scale, speaker_ids=speaker_ids
            )
            parts, b_rows, y_lengths = self.synthesize_launch_predicted(
                enc_out, g, n,
                max_id_len=max((len(s) for s in id_seqs), default=0),
                noise_scale=noise_scale, length_scale=length_scale,
                seed=seed, batch_index=batch_index,
                denoiser_strength=denoiser_strength,
            )
        t2 = time.perf_counter() if trace else 0.0
        audio_rows = self.vocode_collect(parts, b_rows)
        out = self.crop_rows(audio_rows, y_lengths, n, denoiser_strength)
        if trace:
            t3 = time.perf_counter()
            _LOGGER.debug(
                "engine batch=%d rows=%d: encode dispatch %.1f ms, "
                "decode+vocode dispatch %.1f ms, compute+D2H %.1f ms "
                "(%d part(s), %.1f MB)",
                n, b_rows,
                1e3 * (t1 - t0), 1e3 * (t2 - t1), 1e3 * (t3 - t2),
                len(parts),
                sum(r.nbytes for r in audio_rows) / 1e6,
            )
        return out

    def synthesize_stream(
        self,
        ids: np.ndarray,
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        seed: typing.Optional[int] = None,
        denoiser_strength: float = 0.0,
        chunk_frames: int = 64,
        speaker_ids: typing.Optional[typing.Sequence[int]] = None,
    ) -> typing.Iterator[np.ndarray]:
        """Chunked synthesis of ONE utterance: yields int16 audio chunks.

        Time-to-first-audio drops from the whole utterance's vocode +
        transfer to a single chunk's.  Chunks are vocoded with a
        receptive-field halo over a window clamped inside the mel bucket,
        so samples are bit-identical to batch synthesis *before* its
        per-utterance peak normalization — streaming emits at fixed gain
        (the generator's tanh already bounds the waveform).
        """
        if self.vocoder_kind != "hifi_gan":
            # a real exception (not assert): the server middleware maps it
            # to a clear error instead of a bare AssertionError, and the
            # guard survives python -O
            raise ValueError(
                "streaming synthesis requires a HiFi-GAN vocoder "
                f"(engine has vocoder_kind={self.vocoder_kind!r})"
            )
        enc_out, g = self.encode_launch(
            [ids], length_scale, speaker_ids=speaker_ids
        )
        y_lengths = np.asarray(enc_out[4])
        n_frames = int(y_lengths[0])
        mel, z_mask, _key = self.decode_launch(
            enc_out, y_lengths, g, 1, noise_scale=noise_scale, seed=seed
        )
        if self.mesh is not None:
            # the chunked vocode program is plain-jit (Pallas calls are
            # not auto-partitionable); replicate the data-sharded decode
            # output over the mesh so it runs as redundant per-device
            # computation alongside the already-replicated params —
            # streaming is latency-bound, not throughput-bound
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(self.mesh, PartitionSpec())
            # only row 0 is streamed: drop the encode padding rows (the
            # batch was padded to a multiple of n_data) so each chunk
            # vocodes one row, not n_data redundant ones
            mel = jax.device_put(mel[:1], replicated)
            z_mask = jax.device_put(z_mask[:1], replicated)
        m_bucket = mel.shape[1]
        up = self.upsample

        denoise = bool(np.any(np.asarray(denoiser_strength) > 0))
        halo = stream_halo_frames(self.vocoder_cfg)
        if denoise:
            fft = self.audio_settings.filter_length
            hop = self.audio_settings.hop_length
            halo += fft // hop + 1  # STFT frames straddling the boundary
        bias = self._get_bias_spec() if denoise else jnp.zeros((1, 1, 1))
        strength = self._row_param(denoiser_strength, 1, 3)

        window = min(chunk_frames + 2 * halo, m_bucket)
        prev: typing.Optional[typing.Tuple[typing.Any, int, int]] = None
        for start in range(0, n_frames, chunk_frames):
            emit = min(chunk_frames, n_frames - start)
            # slide the window inward at the edges: its boundaries then
            # coincide with the true array edges, keeping exactness
            w_start = min(max(start - halo, 0), m_bucket - window)
            audio_c = self._vocode_stream(
                self.vocoder_params, mel, z_mask, w_start, window,
                bias, strength, denoise,
            )
            _start_d2h(audio_c)
            if prev is not None:
                p_audio, p_off, p_n = prev
                yield np.asarray(p_audio)[0, p_off : p_off + p_n]
            prev = (audio_c, (start - w_start) * up, emit * up)
        if prev is not None:
            p_audio, p_off, p_n = prev
            yield np.asarray(p_audio)[0, p_off : p_off + p_n]


    def _grid_vocode_plan(
        self,
        n_valid: int,
        m: int,
        halo: typing.Optional[int] = None,
        area: typing.Optional[int] = None,
    ) -> typing.Optional[typing.Tuple[int, int]]:
        """Pick the (n_rows, n_time) vocode grid minimizing per-device
        work ``ceil(n_valid/r) * (m/t + 2*halo)`` frames (the model in
        parallel/time_shard.py), subject to the per-device HBM area cap.

        Returns None when plain row sharding (r == n_data, t == 1, work
        = m) is not beaten — the uniform-group path handles that.  Ties
        prefer more rows (less halo re-compute, same wall time).  Grids
        where an entire row shard would hold only padding are excluded:
        every device must carry at least one real row (padded rows may
        ride along in a shard that also holds real ones).

        ``halo``/``area`` default to the HiFi-GAN values; the WaveGlow
        route passes its own (receptive field ~100 frames, quarter area
        cap), which makes the plan decline except at long mels — the
        correct physics, not a missing feature.
        """
        n = self._n_data
        if halo is None:
            halo = self._ts_halo
        if area is None:
            area = MAX_VOCODE_AREA
        best: typing.Optional[typing.Tuple[int, int]] = None
        best_w = m  # plain row sharding's per-device work
        for n_rows in range(n, 0, -1):
            if n % n_rows:
                continue
            n_time = n // n_rows
            if n_time > max(m, 1):
                continue
            rows_per = -(-n_valid // n_rows)
            if (n_rows - 1) * rows_per >= n_valid:
                continue  # last row shard would be pure padding
            window = min(
                -(-m // n_time) + (2 * halo if n_time > 1 else 0), m
            )
            work = rows_per * window
            if work >= best_w or work > area:
                continue
            best, best_w = (n_rows, n_time), work
        return best

    def _mesh_uniform_groups(self, b, m, n_valid, area, tensors, dispatch):
        """Mesh vocode grouping shared by HiFi-GAN and WaveGlow.

        Uniform-width groups, each a multiple of the data-axis size so
        the rows split evenly across devices (shard_map for HiFi, GSPMD
        for WaveGlow's plain-jit program).  The final window clamps to
        the array end (b is itself a multiple of n_data) — overlapping
        rows are re-vocoded with identical results rather than sliced
        out of bounds.  The HBM cap is per DEVICE, so the global-row
        budget scales by n_data.  ``tensors`` are sliced along axis 0
        and handed to ``dispatch``; device->host copies start
        immediately so transfers overlap later groups' compute.
        """
        group = max(1, (area * self._n_data) // m)
        group = max(group - group % self._n_data, self._n_data)
        parts = []
        for start in range(0, b, group):
            if start >= n_valid:
                break
            if group >= b:
                sliced = tensors
                idxs = list(range(b))
            else:
                start = min(start, b - group)
                sliced = [
                    jax.lax.slice_in_dim(t, start, start + group, axis=0)
                    for t in tensors
                ]
                idxs = list(range(start, start + group))
            part = dispatch(*sliced)
            _start_d2h(part)
            parts.append((part, idxs))
        return parts

    def _vocode_launch_hifi(
        self, mel, z_mask, n_valid, denoiser_strength, y_lengths=None
    ):
        """Vocode [B, M, C] mels, splitting rows so rows*M <= MAX_VOCODE_AREA.

        Only the first ``n_valid`` rows carry real sentences; trailing pad
        rows are never vocoded.  With ``y_lengths`` the valid rows are
        sorted by mel length (one device gather) and each row group runs
        at ITS OWN bucketed frame width — short sentences sharing a batch
        with long ones stop paying the long rows' compute and, worse, the
        slow host link's transfer bytes (~41 MB/s through the tunnel).
        Returns (device part, original row indices) pairs with async
        device->host copies started, so transfers overlap later groups'
        compute; join with :meth:`vocode_collect`.
        """
        b, m, _ = mel.shape
        denoise = bool(np.any(np.asarray(denoiser_strength) > 0))
        bias = self._get_bias_spec() if denoise else jnp.zeros((1, 1, 1))

        # per-row denoiser strengths in original row order
        str_rows = self._row_values(denoiser_strength, b)

        if self.mesh is not None:
            if n_valid == 1 and m >= self._time_shard_min_frames:
                self._time_shard_hits += 1
                # one long utterance cannot be row-sharded — time-shard
                # its vocode across the mesh instead (latency, not
                # throughput; see parallel/time_shard.py).  Short buckets
                # fall through to the group path below: the halo tax
                # would make time sharding SLOWER than one device for
                # m < ~2*halo*N/(N-1) (gate set in __init__).
                part = self._vocode_time_sharded(
                    self.vocoder_params,
                    jax.lax.slice_in_dim(mel, 0, 1, axis=0),
                    jax.lax.slice_in_dim(z_mask, 0, 1, axis=0),
                    bias,
                    self._row_param(str_rows[:1], 1, 3),
                    denoise,
                )
                _start_d2h(part)
                return [(part, [0])]
            if 1 < n_valid < self._n_data:
                plan = self._grid_vocode_plan(n_valid, m)
                if plan is not None:
                    n_rows, n_time = plan
                    fn = self._grid_fns.get(plan)
                    if fn is None:
                        fn = self._grid_fns[plan] = (
                            self._build_grid_vocode(n_rows, n_time)
                        )
                    self._grid_shard_hits += 1
                    part = fn(
                        self.vocoder_params,
                        jax.lax.slice_in_dim(mel, 0, n_valid, axis=0),
                        jax.lax.slice_in_dim(z_mask, 0, n_valid, axis=0),
                        bias,
                        self._row_param(str_rows[:n_valid], n_valid, 3),
                        denoise,
                    )
                    _start_d2h(part)
                    return [(part, list(range(n_valid)))]
            strength = self._row_param(str_rows, b, 3)
            return self._mesh_uniform_groups(
                b, m, n_valid, MAX_VOCODE_AREA,
                (mel, z_mask, strength),
                lambda mel_g, mask_g, str_g: self._vocode(
                    self.vocoder_params, mel_g, mask_g, bias, str_g, denoise
                ),
            )

        # ---- single-device: length-sorted ragged groups
        if y_lengths is not None:
            lens = np.asarray(y_lengths)[:n_valid].astype(np.int64)
        else:
            lens = np.full((n_valid,), m, dtype=np.int64)
        order = np.argsort(-lens, kind="stable")
        if np.array_equal(order, np.arange(n_valid)) and n_valid == b:
            mel_s, mask_s = mel, z_mask
        else:
            idx = jnp.asarray(order.astype(np.int32))
            mel_s = jnp.take(mel, idx, axis=0)
            mask_s = jnp.take(z_mask, idx, axis=0)
        sorted_lens = lens[order]

        # denoised rows crop to nf*hop + fft samples, slightly past the
        # y*up valid length — widen the per-group bucket by the STFT tail
        margin = (
            -(-self.audio_settings.filter_length // self.upsample)
            if denoise
            else 0
        )
        parts = []
        for start, group, m_g in self._ragged_group_plan(
            sorted_lens, n_valid, m, MAX_VOCODE_AREA, margin=margin
        ):
            whole = group == b and m_g == m and n_valid == b
            if whole:
                mel_g, mask_g = mel_s, mask_s
            else:
                mel_g = jax.lax.slice(
                    mel_s, (start, 0, 0), (start + group, m_g, mel.shape[2])
                )
                mask_g = jax.lax.slice(
                    mask_s, (start, 0), (start + group, m_g)
                )
            str_g = self._row_param(
                str_rows[order[start : start + group]], group, 3
            )
            part = self._vocode(
                self.vocoder_params, mel_g, mask_g, bias, str_g, denoise
            )
            _start_d2h(part)
            parts.append(
                (part, [int(order[i]) for i in range(start, start + group)])
            )
        return parts

    def _ragged_group_plan(
        self,
        sorted_lens: np.ndarray,
        n_valid: int,
        m: int,
        area: int,
        margin: int = 0,
    ) -> typing.List[typing.Tuple[int, int, int]]:
        """Plan ragged vocode groups over length-DESC-sorted rows:
        [(start, rows, frame_bucket)], shared by the HiFi-GAN and
        WaveGlow launch paths.

        Rows at least half the group width ride along; a >=2x length drop
        starts a narrower group (bounds padding waste per row to 2x while
        keeping the dispatch count low).  Power-of-two group sizes keep
        the compiled-shape set bounded (a remainder of 5 runs as 4 + 1,
        not a one-off (5, m) program).

        Multi-group plans ramp the FIRST group down to one row: the wall
        clock of a large batch is gated by when the audio device->host
        transfer can start (the tunnel link moves ~50 MB/s while compute
        finishes well before the transfer does), so a 1-row first group
        puts bytes on the link one group-compute earlier, and the doubling
        ramp (1, 1, 2, 4, ...) keeps the dispatch count logarithmic.  The
        ramp sizes are the same power-of-two (rows, bucket) shapes the
        un-ramped plan already compiles.  Plans whose total estimated
        transfer is small (< ramp_min_bytes) skip the ramp — there the
        extra dispatch round trips ARE the wall (the SSML workload's small
        per-voice units fragmented 1,1,2,2 before this gate).
        """
        # the ramp trades extra dispatches (~24 ms each through the
        # tunnel) for an earlier link start — only worth it when the
        # transfer itself dominates the wall (see ramp_min_bytes)
        est_bytes = (
            2
            * self.upsample
            * sum(
                min(self.policy.mel_bucket(int(L) + margin), m)
                for L in sorted_lens[:n_valid]
            )
        )
        ramp = ramp_first_group() and est_bytes >= ramp_min_bytes()

        # Small DISPATCH-BOUND batches (a multi-voice SSML document's
        # per-voice units) merge into ONE group at the longest row's
        # bucket: each avoided group saves a ~24 ms tunnel round trip,
        # which beats the <=2x padding compute/transfer of the short
        # rows (the round-4 SSML profile showed a 6-row ~3 MB unit
        # split into 4 vocode dispatches ~= 96 ms of round trips for
        # ~80 ms of total compute).  Capped at 8 rows so the one-off
        # (n, bucket) shapes stay a small, persistent-cacheable set.
        if 1 < n_valid <= 8 and est_bytes < ramp_min_bytes():
            m_g = min(
                self.policy.mel_bucket(int(sorted_lens[0]) + margin), m
            )
            if n_valid * m_g <= area:
                return [(0, n_valid, m_g)]

        plan = []
        start = 0
        while start < n_valid:
            m_g = min(
                self.policy.mel_bucket(int(sorted_lens[start]) + margin), m
            )
            remaining = n_valid - start
            fit = max(1, area // m_g)
            ext = 1
            while (
                start + ext < n_valid
                and self.policy.mel_bucket(int(sorted_lens[start + ext])) * 2
                > m_g
            ):
                ext += 1
            group = 1 << (min(fit, ext, remaining).bit_length() - 1)
            if ramp and start == 0 and group > 1 and group < n_valid:
                # multi-group batch: ramp-up so the first (longest) row's
                # transfer starts after a 1-row compute, not a full group's
                size = 1
                while size <= group // 2:
                    plan.append((start, size, m_g))
                    start += size
                    size = min(size * 2, group)
                continue
            plan.append((start, group, m_g))
            start += group
        return plan

    def _get_bias_spec(self):
        if self._bias_spec is None:
            with self._lock:
                if self._bias_spec is None:
                    _LOGGER.debug("Initializing denoiser bias spectrum")
                    self._bias_spec = self._bias_audio_fn(self.vocoder_params)
        return self._bias_spec

    # ------------------------------------------------------------------
    # parity-surface primitives (used by the model wrapper classes)

    def phonemes_to_mels(self, ids: np.ndarray, noise_scale=0.667,
                         length_scale=1.0, seed=None, speaker_id=None):
        """Single sequence -> raw (normalized) mels [1, C, M_valid]."""
        speaker_ids = None if speaker_id is None else [int(speaker_id)]
        (x_m, x_logs, _logw, w_ceil, y_dev, _), y_lengths, g = self.encode_batch(
            [np.asarray(ids)], length_scale, speaker_ids=speaker_ids
        )
        mel_bucket = self.policy.mel_bucket(int(y_lengths[0]))
        key = jax.random.PRNGKey(self.seed if seed is None else seed)
        mel, _ = self._decode(
            self.glow_params, x_m, x_logs, w_ceil, y_dev,
            key, self._row_param(noise_scale, x_m.shape[0], 3), mel_bucket, g,
        )
        frames = int(y_lengths[0])
        return np.asarray(mel, dtype=np.float32)[0:1, :frames, :].transpose(0, 2, 1)

    def warmup(
        self,
        text_lengths: typing.Sequence[int] = (16, 64),
        batch_sizes: typing.Sequence[int] = (1,),
    ):
        """Pre-compile the bucket programs used by a workload."""
        rng = np.random.default_rng(0)
        for b in batch_sizes:
            for t in text_lengths:
                seqs = [
                    rng.integers(1, self.glow_cfg.num_symbols, size=t).astype(np.int64)
                    for _ in range(b)
                ]
                self.synthesize_batch(seqs)
