"""GlowTTS acoustic-model wrapper: checkpoint loading + phonemes_to_mels.

Public-surface parity with larynx/glow_tts.py (GlowTextToSpeech), but the
model runs as jitted JAX programs instead of an ONNX Runtime session.
Checkpoint preference: native ``generator.npz`` > ``generator.pth``
(converted) > ``generator.onnx`` (converted); the reference's
backend-choice semantics (larynx/glow_tts.py:44-62) map onto which artifact
gets converted.
"""

import json
import logging
import typing
from pathlib import Path

import numpy as np

from larynx_tpu.constants import (
    InferenceBackend,
    SettingsType,
    TextToSpeechModel,
    TextToSpeechModelConfig,
)
from larynx_tpu.models.glow_tts import config_from_voice_json

_LOGGER = logging.getLogger("larynx_tpu.glow_tts")


def load_glow_tts_artifacts(
    model_dir: Path, backend: typing.Optional[InferenceBackend] = None
):
    """Resolve + convert the checkpoint in a voice dir.

    Returns (params pytree, GlowTTSConfig, raw config dict).
    """
    config_path = model_dir / "config.json"
    with open(config_path, "r", encoding="utf-8") as f:
        raw_config = json.load(f)
    cfg = config_from_voice_json(raw_config)

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
        _LOGGER.debug("Loading GlowTTS checkpoint from %s", path)
        if path.suffix == ".npz":
            from larynx_tpu.convert.native import load_params

            return load_params(path), cfg, raw_config
        if path.suffix == ".pth":
            from larynx_tpu.convert.torch_import import (
                glow_tts_params_from_state_dict,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(path, key="model")
            return glow_tts_params_from_state_dict(sd, cfg), cfg, raw_config
        if path.suffix == ".onnx":
            from larynx_tpu.convert.onnx_import import (
                glow_tts_params_from_onnx,
            )

            return glow_tts_params_from_onnx(path, cfg), cfg, raw_config

    raise FileNotFoundError(
        f"No loadable checkpoint (generator.npz/.pth/.onnx) in {model_dir}"
    )


class GlowTextToSpeech(TextToSpeechModel):
    """Acoustic model for one voice (parity: larynx/glow_tts.py:33-168)."""

    def __init__(self, config: TextToSpeechModelConfig):
        super().__init__(config)
        model_dir = Path(config.model_path)
        self.params, self.model_config, self.raw_config = load_glow_tts_artifacts(
            model_dir, backend=config.backend
        )
        self.half = config.half
        self.seed = config.seed

        # Default inference settings (larynx/glow_tts.py:104-121)
        self.noise_scale = 0.667
        self.length_scale = 1.0

        self._engine = None  # lazy standalone engine (mels-only)

        # set by the pipeline after loading (larynx/__init__.py:362-363)
        self.phoneme_to_id: typing.Dict[str, int] = {}
        self.audio_settings = None

    def _get_engine(self):
        if self._engine is None:
            from larynx_tpu.audio import AudioSettings
            from larynx_tpu.runtime.engine import SynthesisEngine

            settings = self.audio_settings or AudioSettings()
            self._engine = SynthesisEngine(
                self.params,
                self.model_config,
                settings,
                vocoder_kind="none",
                half=self.half,
                seed=self.seed if self.seed is not None else 1234,
            )
        return self._engine

    def phonemes_to_mels(
        self,
        phoneme_ids: np.ndarray,
        settings: typing.Optional[SettingsType] = None,
    ) -> np.ndarray:
        """ids [T] or [1, T] -> normalized mels [1, n_mels, T']."""
        noise_scale = self.noise_scale
        length_scale = self.length_scale
        speaker_id = None
        if settings:
            noise_scale = float(settings.get("noise_scale", noise_scale))
            length_scale = float(settings.get("length_scale", length_scale))
            speaker_id = settings.get("speaker_id", None)
        ids = np.asarray(phoneme_ids)
        if ids.ndim == 2:
            ids = ids[0]
        return self._get_engine().phonemes_to_mels(
            ids,
            noise_scale=noise_scale,
            length_scale=length_scale,
            seed=self.seed,
            speaker_id=speaker_id,
        )
