"""HiFi-GAN vocoder wrapper: checkpoint loading + mels_to_audio.

Public-surface parity with larynx/hifi_gan.py (HiFiGanVocoder); the
generator and the bias denoiser run as jitted JAX programs.
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
from larynx_tpu.models.hifi_gan import (
    generator,
    hifi_gan_config_from_json,
)
from larynx_tpu.models.hifi_gan import denoiser as hifi_denoiser
from larynx_tpu.runtime.buckets import BucketPolicy

_LOGGER = logging.getLogger("larynx_tpu.hifi_gan")


def load_hifi_gan_artifacts(
    model_dir: Path, backend: typing.Optional[InferenceBackend] = None
):
    """Resolve + convert the vocoder checkpoint in a model dir."""
    config_path = model_dir / "config.json"
    with open(config_path, "r", encoding="utf-8") as f:
        raw_config = json.load(f)
    cfg = hifi_gan_config_from_json(raw_config)

    npz_path = model_dir / "generator.npz"
    pth_path = model_dir / "generator.pth"
    onnx_path = model_dir / "generator.onnx"

    if backend == InferenceBackend.PYTORCH:
        order = [pth_path]
    elif backend == InferenceBackend.ONNX:
        order = [onnx_path]
    elif backend == InferenceBackend.JAX:
        order = [npz_path]
    else:
        order = [npz_path, pth_path, onnx_path]

    for path in order:
        if not path.is_file():
            continue
        _LOGGER.debug("Loading HiFi-GAN checkpoint from %s", path)
        if path.suffix == ".npz":
            from larynx_tpu.convert.native import load_params

            return load_params(path), cfg
        if path.suffix == ".pth":
            from larynx_tpu.convert.torch_import import (
                hifi_gan_params_from_state_dict,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(path, key="generator")
            params = hifi_gan_params_from_state_dict(
                sd,
                cfg.upsample_rates,
                cfg.resblock_kernel_sizes,
                resblock=cfg.resblock,
            )
            return params, cfg
        if path.suffix == ".onnx":
            from larynx_tpu.convert.onnx_import import hifi_gan_params_from_onnx

            return hifi_gan_params_from_onnx(path, cfg), cfg

    raise FileNotFoundError(
        f"No loadable checkpoint (generator.npz/.pth/.onnx) in {model_dir}"
    )


class HiFiGanVocoder(VocoderModel):
    """Vocoder wrapper (parity: larynx/hifi_gan.py:33-203)."""

    def __init__(self, config: VocoderModelConfig, executor=None):
        super().__init__(config)
        model_dir = Path(config.model_path)
        self.params, self.model_config = load_hifi_gan_artifacts(
            model_dir, backend=config.backend
        )
        self.mel_channels = self.model_config.num_mels
        self.denoiser_strength = config.denoiser_strength
        self.half = config.half
        self.policy = BucketPolicy()

        dtype = jnp.bfloat16 if config.half else jnp.float32
        self.params = jax.tree.map(
            lambda x: jnp.asarray(
                x, dtype if jnp.issubdtype(np.asarray(x).dtype, np.floating) else None
            ),
            self.params,
        )

        from larynx_tpu.runtime.engine import default_use_pallas

        cfg = self.model_config
        use_pallas = default_use_pallas()

        @jax.jit
        def generate(params, mel):
            # mel [B, C, M] -> audio [B, M * upsample]
            return generator(
                params, cfg, jnp.swapaxes(mel, 1, 2), use_pallas=use_pallas
            ).astype(jnp.float32)

        self._generate = generate
        self.bias_spec: typing.Optional[jnp.ndarray] = None
        self.denoiser_future = None
        if self.denoiser_strength > 0:
            if executor is not None:
                self.denoiser_future = executor.submit(self.maybe_init_denoiser)
            else:
                self.maybe_init_denoiser()

    def mels_to_audio(
        self,
        mels: np.ndarray,
        settings: typing.Optional[SettingsType] = None,
    ) -> np.ndarray:
        """Post-processed mels [1, n_mels, T'] -> int16 audio [T'*upsample]."""
        mels = np.asarray(mels, dtype=np.float32)
        if mels.ndim == 2:
            mels = mels[None]
        frames = mels.shape[-1]
        bucket = self.policy.mel_bucket(frames)
        if bucket > frames:
            pad = np.full(
                (mels.shape[0], mels.shape[1], bucket - frames),
                np.log(1e-5),
                dtype=np.float32,
            )
            mels = np.concatenate([mels, pad], axis=-1)

        audio = np.asarray(self._generate(self.params, jnp.asarray(mels)))
        audio = audio[:, : frames * self.model_config.total_upsample]

        denoiser_strength = self.denoiser_strength
        if settings:
            denoiser_strength = float(
                settings.get("denoiser_strength", denoiser_strength)
            )

        if denoiser_strength > 0:
            if self.denoiser_future is not None:
                import concurrent.futures

                concurrent.futures.wait([self.denoiser_future])
                self.denoiser_future = None
            self.maybe_init_denoiser()
            _LOGGER.debug("Running denoiser (strength=%s)", denoiser_strength)
            audio = np.asarray(
                hifi_denoiser.denoise(
                    jnp.asarray(audio), self.bias_spec, denoiser_strength
                )
            )

        return audio_float_to_int16(audio).squeeze()

    def maybe_init_denoiser(self) -> None:
        """Vocode an 88-frame zero mel to get the bias spectrum
        (larynx/hifi_gan.py:181-203)."""
        if self.bias_spec is None:
            _LOGGER.debug("Initializing denoiser")
            zeros = jnp.zeros(
                (1, self.mel_channels, hifi_denoiser.BIAS_MEL_FRAMES),
                dtype=jnp.float32,
            )
            bias_audio = self._generate(self.params, zeros)
            self.bias_spec = hifi_denoiser.compute_bias_spec(bias_audio)
