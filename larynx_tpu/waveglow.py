"""WaveGlow vocoder wrapper: checkpoint loading + mels_to_audio.

The reference declares ``VocoderType.WAVEGLOW`` and lists the voice
(larynx/constants.py:31, larynx/VOCODERS:4, local/waveglow/wn_256) but
``load_vocoder_model`` has no branch for it (larynx/__init__.py:498-508).
Here it is a working third vocoder family; drop the NVIDIA
``waveglow_*`` checkpoint into the model dir as ``generator.pth`` (or a
native ``generator.npz``) and it loads.
"""

import json
import logging
import typing
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from larynx_tpu.audio import audio_float_to_int16
from larynx_tpu.constants import (
    InferenceBackend,
    SettingsType,
    VocoderModel,
    VocoderModelConfig,
)
from larynx_tpu.models.hifi_gan import denoiser as hifi_denoiser
from larynx_tpu.models.waveglow import waveglow_config_from_json
from larynx_tpu.models.waveglow import model as wg_model
from larynx_tpu.runtime.buckets import BucketPolicy

_LOGGER = logging.getLogger("larynx_tpu.waveglow")


def _refresh_inverses(params):
    """Recompute every invertible-1x1 inverse from its weight.

    Training only updates ``w`` (``w_inv`` gets zero gradients), so a
    trained checkpoint's stored inverse can be stale; inference depends
    on it being exact."""
    import numpy as np

    for flow in params.get("flows", []):
        conv = flow.get("convinv")
        if conv is not None and "w" in conv:
            conv["w_inv"] = jnp.asarray(np.linalg.inv(np.asarray(conv["w"])))
    return params


def load_waveglow_artifacts(
    model_dir: Path, backend: typing.Optional[InferenceBackend] = None
):
    """Resolve + convert the WaveGlow checkpoint in a model dir."""
    with open(model_dir / "config.json", "r", encoding="utf-8") as f:
        cfg = waveglow_config_from_json(json.load(f))

    npz_path = model_dir / "generator.npz"
    pth_paths = sorted(model_dir.glob("*.pth")) + sorted(
        model_dir.glob("*.pt")
    )
    order: typing.List[Path] = []
    if backend == InferenceBackend.PYTORCH:
        order = pth_paths
    elif backend == InferenceBackend.JAX:
        order = [npz_path]
    else:
        order = [npz_path] + pth_paths

    for path in order:
        if not path.is_file():
            continue
        _LOGGER.debug("Loading WaveGlow checkpoint from %s", path)
        if path.suffix == ".npz":
            from larynx_tpu.convert.native import load_params

            return _refresh_inverses(load_params(path)), cfg
        from larynx_tpu.convert.torch_import import (
            load_torch_state_dict,
            waveglow_params_from_state_dict,
        )

        sd = load_torch_state_dict(path, key="model")
        return waveglow_params_from_state_dict(sd, cfg), cfg

    raise FileNotFoundError(
        f"No loadable WaveGlow checkpoint (generator.npz/*.pth) in {model_dir}"
    )


class WaveGlowVocoder(VocoderModel):
    """Vocoder wrapper with the reference's ``mels_to_audio`` surface."""

    def __init__(
        self, config: VocoderModelConfig, sigma: typing.Optional[float] = None
    ):
        super().__init__(config)
        model_dir = Path(config.model_path)
        self.params, self.model_config = load_waveglow_artifacts(
            model_dir, backend=config.backend
        )
        # the model dir's config records the sampling sigma (a model
        # trained at non-default sigma must not be sampled at 0.9)
        self.sigma = self.model_config.sigma if sigma is None else sigma
        self.half = config.half
        self.policy = BucketPolicy()
        # itertools.count: atomic under the GIL, so concurrent
        # mels_to_audio calls never reuse a noise key
        import itertools

        self._counter = itertools.count(1)

        cfg = self.model_config
        sigma = self.sigma  # resolved value, not the ctor's None default
        dtype = jnp.bfloat16 if config.half else jnp.float32
        # same default as the engine path: fused Pallas WN kernels on
        # TPU when the geometry is lane-legal (see runtime/engine.py)
        import os as _os

        from larynx_tpu.ops.wn_layer import supports_geometry
        from larynx_tpu.runtime.engine import default_use_pallas

        _env = _os.environ.get("LARYNX_TPU_WAVEGLOW_PALLAS", "").strip().lower()
        if _env in ("0", "false", "off", "no"):
            use_pallas = False
        elif _env:
            use_pallas = default_use_pallas()
        else:
            use_pallas = default_use_pallas() and supports_geometry(
                cfg.wn_channels, cfg.mel_channels * cfg.groups
            )
        if config.half:
            self.params = jax.tree.map(
                lambda x: jnp.asarray(x).astype(dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                else x,
                self.params,
            )

        @jax.jit
        def generate(params, mel, key):
            # mel [B, n_mels, M] -> audio [B, M * upsample_stride]
            return wg_model.infer(
                params, cfg, jnp.swapaxes(mel, 1, 2).astype(dtype),
                key=key, sigma=sigma, use_pallas=use_pallas,
            ).astype(jnp.float32)

        self._generate = generate

        @jax.jit
        def generate_z(params, mel, z):
            # pre-drawn prior noise [B, blocks, groups]: the chunked long
            # path slices ONE utterance-wide draw so chunk seams see the
            # same prior on both sides
            return wg_model.infer(
                params, cfg, jnp.swapaxes(mel, 1, 2).astype(dtype),
                z=z.astype(dtype), use_pallas=use_pallas,
            ).astype(jnp.float32)

        self._generate_z = generate_z

        # bias denoiser, same contract as HiFiGanVocoder
        # (larynx/hifi_gan.py:171-203): zero mel + ZERO prior (sigma=0,
        # NVIDIA's Denoiser mode) -> first-STFT-frame bias spectrum
        self.denoiser_strength = config.denoiser_strength
        self.bias_spec: typing.Optional[jnp.ndarray] = None

    def maybe_init_denoiser(self) -> None:
        if self.bias_spec is None:
            _LOGGER.debug("Initializing WaveGlow denoiser")
            cfg = self.model_config
            frames = hifi_denoiser.BIAS_MEL_FRAMES
            zeros_mel = jnp.zeros((1, cfg.mel_channels, frames))
            blocks = frames * cfg.upsample_stride // cfg.groups
            zeros_z = jnp.zeros((1, blocks, cfg.groups))
            bias_audio = self._generate_z(self.params, zeros_mel, zeros_z)
            self.bias_spec = hifi_denoiser.compute_bias_spec(bias_audio)

    def _maybe_denoise(
        self,
        audio: np.ndarray,
        settings: typing.Optional[SettingsType],
    ) -> np.ndarray:
        strength = self.denoiser_strength
        if settings:
            strength = float(settings.get("denoiser_strength", strength))
        if strength <= 0:
            return audio
        self.maybe_init_denoiser()
        _LOGGER.debug("Running denoiser (strength=%s)", strength)
        return np.asarray(
            hifi_denoiser.denoise(
                jnp.asarray(audio), self.bias_spec, strength
            )
        )

    def _halo_frames(self) -> int:
        """Mel frames covering the full compound receptive field.

        Each WN sees 1 + (k-1)·(2^layers − 1) blocks; the 12 flows
        compose, and a mel frame conditions upsample_kernel/stride
        output frames through the transposed conv.  A chunk padded by
        this halo reproduces the unchunked samples in its interior.
        """
        cfg = self.model_config
        rf_wn = 1 + (cfg.wn_kernel_size - 1) * (2**cfg.wn_layers - 1)
        blocks = cfg.flows * (rf_wn - 1)
        blocks_per_frame = cfg.upsample_stride // cfg.groups
        return -(-blocks // blocks_per_frame) + -(
            -cfg.upsample_kernel // cfg.upsample_stride
        )

    def mels_to_audio(
        self,
        mels: np.ndarray,
        settings: typing.Optional[SettingsType] = None,
    ) -> np.ndarray:
        """Post-processed mels [1, n_mels, M] -> int16 audio.

        Very long utterances are vocoded in receptive-field-haloed time
        chunks so the WN activation footprint stays bounded (the engine
        path caps rows*frames at MAX_VOCODE_AREA/4 for the same reason);
        interior samples match the unchunked program.
        """
        from larynx_tpu.runtime.engine import MAX_VOCODE_AREA

        mels = np.asarray(mels, dtype=np.float32)
        if mels.ndim == 2:
            mels = mels[None]
        frames = mels.shape[-1]
        cfg = self.model_config
        stride = cfg.upsample_stride
        cap = max(256, (MAX_VOCODE_AREA // 4) // mels.shape[0])
        if frames <= cap:
            audio = self._vocode_bucketed(mels)
        else:
            audio = self._vocode_chunked(mels, cap)
        audio = self._maybe_denoise(audio, settings)
        return audio_float_to_int16(audio.squeeze(0))

    def _vocode_chunked(
        self,
        mels: np.ndarray,
        cap: int,
        z_full: typing.Optional[jnp.ndarray] = None,
    ) -> np.ndarray:
        """Receptive-field-haloed time chunks over ONE prior draw.

        The prior is drawn utterance-wide (or passed in by tests) and
        sliced per chunk, so both sides of a seam see the same noise —
        per-chunk draws would phase-jump at every boundary.
        """
        cfg = self.model_config
        frames = mels.shape[-1]
        stride = cfg.upsample_stride
        halo = self._halo_frames()
        blocks_per_frame = stride // cfg.groups
        plan = []
        max_end = 0
        for start in range(0, frames, cap):
            lo = max(0, start - halo)
            hi = min(frames, start + cap + halo)
            bucket = self.policy.mel_bucket(hi - lo)
            plan.append((start, lo, hi, bucket))
            max_end = max(max_end, lo + bucket)
        if z_full is None:
            z_full = self.sigma * jax.random.normal(
                jax.random.PRNGKey(next(self._counter)),
                (mels.shape[0], max_end * blocks_per_frame, cfg.groups),
            )
        chunks: typing.List[np.ndarray] = []
        for start, lo, hi, bucket in plan:
            mel_c = mels[:, :, lo:hi]
            if bucket > hi - lo:
                pad = np.full(
                    (mels.shape[0], mels.shape[1], bucket - (hi - lo)),
                    np.log(1e-5),
                    dtype=np.float32,
                )
                mel_c = np.concatenate([mel_c, pad], axis=-1)
            z_c = jax.lax.dynamic_slice_in_dim(
                z_full, lo * blocks_per_frame, bucket * blocks_per_frame, 1
            )
            part = np.asarray(
                self._generate_z(self.params, jnp.asarray(mel_c), z_c)
            )
            end = min(frames, start + cap)
            chunks.append(part[:, (start - lo) * stride : (end - lo) * stride])
        return np.concatenate(chunks, axis=-1)

    def _vocode_bucketed(self, mels: np.ndarray) -> np.ndarray:
        """Run the jitted generator at the frames' bucketed width."""
        frames = mels.shape[-1]
        bucket = self.policy.mel_bucket(frames)
        if bucket > frames:
            pad = np.full(
                (mels.shape[0], mels.shape[1], bucket - frames),
                np.log(1e-5),
                dtype=np.float32,
            )
            mels = np.concatenate([mels, pad], axis=-1)
        audio = np.asarray(
            self._generate(
                self.params,
                jnp.asarray(mels),
                jax.random.PRNGKey(next(self._counter)),
            )
        )
        return audio[:, : frames * self.model_config.upsample_stride]
