"""Tacotron2 acoustic-model wrapper: checkpoint loading + phonemes_to_mels.

The reference declares ``TextToSpeechType.TACOTRON2`` (larynx/constants.py:22)
but has no implementation; this wrapper gives the family the same public
surface GlowTTS has (larynx/glow_tts.py:33-168 shape), running the JAX
model in ``models/tacotron2``.  Checkpoint preference: native
``generator.npz`` > ``generator.pth`` (NVIDIA layout, converted).

Inference is one jitted scan program per (text-bucket, max-steps) pair;
phoneme ids are padded to a small set of buckets so recompiles stay
bounded (the sequential decode itself is the latency cost of this
family — GlowTTS remains the parallel-decode flagship).
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
from larynx_tpu.models.tacotron2 import tacotron2_config_from_voice_json

_LOGGER = logging.getLogger("larynx_tpu.tacotron2")

_TEXT_BUCKETS = (16, 32, 64, 96, 128, 192, 256, 384)
# decoder-step budget per encoder token (~87 frames/s at 256-hop 22kHz;
# generous so the gate, not the cap, normally ends the decode)
_MAX_FRAMES_PER_TOKEN = 10


def load_tacotron2_artifacts(
    model_dir: Path, backend: typing.Optional[InferenceBackend] = None
):
    """Resolve + convert the checkpoint in a voice dir.

    Returns (params pytree, Tacotron2Config, raw config dict).
    """
    with open(model_dir / "config.json", "r", encoding="utf-8") as f:
        raw_config = json.load(f)
    cfg = tacotron2_config_from_voice_json(raw_config)

    npz_path = model_dir / "generator.npz"
    pth_path = model_dir / "generator.pth"
    if backend == InferenceBackend.PYTORCH:
        order = [pth_path]
    elif backend == InferenceBackend.JAX:
        order = [npz_path]
    else:
        order = [npz_path, pth_path]

    for path in order:
        if not path.is_file():
            continue
        _LOGGER.debug("Loading Tacotron2 checkpoint from %s", path)
        if path.suffix == ".npz":
            from larynx_tpu.convert.native import load_params

            return load_params(path), cfg, raw_config
        from larynx_tpu.convert.torch_import import (
            load_torch_state_dict,
            tacotron2_params_from_state_dict,
        )

        sd = load_torch_state_dict(path, key="state_dict")
        return tacotron2_params_from_state_dict(sd, cfg), cfg, raw_config

    raise FileNotFoundError(
        f"No loadable checkpoint (generator.npz/.pth) in {model_dir}"
    )


class Tacotron2TextToSpeech(TextToSpeechModel):
    """Acoustic model for one Tacotron2 voice."""

    def __init__(self, config: TextToSpeechModelConfig):
        super().__init__(config)
        model_dir = Path(config.model_path)
        self.params, self.model_config, self.raw_config = (
            load_tacotron2_artifacts(model_dir, backend=config.backend)
        )
        self.half = config.half
        self.seed = config.seed

        self._compiled: typing.Dict[typing.Tuple[int, int], typing.Any] = {}

        # set by the pipeline after loading (larynx/__init__.py:362-363)
        self.phoneme_to_id: typing.Dict[str, int] = {}
        self.audio_settings = None

    def _infer_fn(self, t_bucket: int, max_steps: int):
        key = (t_bucket, max_steps)
        fn = self._compiled.get(key)
        if fn is None:
            import jax
            from functools import partial

            from larynx_tpu.models.tacotron2 import infer

            cfg = self.model_config
            fn = jax.jit(
                partial(infer, cfg=cfg, max_steps=max_steps),
                static_argnames=(),
            )
            self._compiled[key] = fn
        return fn

    def phonemes_to_mels(
        self,
        phoneme_ids: np.ndarray,
        settings: typing.Optional[SettingsType] = None,
    ) -> np.ndarray:
        """ids [T] or [1, T] -> mels [1, n_mels, S] (gate-cropped)."""
        import jax
        import jax.numpy as jnp

        cfg = self.model_config
        max_decoder_steps = cfg.max_decoder_steps
        seed = self.seed if self.seed is not None else 1234
        if settings:
            max_decoder_steps = int(
                settings.get("max_decoder_steps", max_decoder_steps)
            )
            seed = int(settings.get("seed", seed))

        ids = np.asarray(phoneme_ids)
        if ids.ndim == 1:
            ids = ids[None, :]
        t = ids.shape[1]
        t_bucket = next((b for b in _TEXT_BUCKETS if b >= t), t)
        padded = np.zeros((ids.shape[0], t_bucket), dtype=np.int32)
        padded[:, :t] = ids
        max_steps = min(max_decoder_steps, _MAX_FRAMES_PER_TOKEN * t_bucket)

        fn = self._infer_fn(t_bucket, max_steps)
        mel, lengths = fn(
            params=self.params,
            ids=jnp.asarray(padded),
            lengths=jnp.full((ids.shape[0],), t, dtype=jnp.int32),
            key=jax.random.PRNGKey(seed),
        )
        n = max(int(np.max(np.asarray(lengths))), 1)
        mel = np.asarray(mel[:, :n, :], dtype=np.float32)
        return np.transpose(mel, (0, 2, 1))  # [B, n_mels, S]
