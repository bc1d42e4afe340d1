"""Griffin-Lim fallback vocoder wrapper (parity: larynx/griffin_lim.py)."""

import typing

import numpy as np

import jax
import jax.numpy as jnp

from larynx_tpu.constants import SettingsType, VocoderModel, VocoderModelConfig


class GriffinLimVocoder(VocoderModel):
    """Griffin-Lim fallback vocoder (parity: larynx/griffin_lim.py:22-76),
    running fully on device."""

    def __init__(
        self,
        config: VocoderModelConfig,
        sample_rate: int = 22050,
        num_fft: int = 1024,
        num_mels: int = 80,
        mel_fmin: float = 0.0,
        mel_fmax: float = 8000.0,
        mel_scaling: float = 1000.0,
        iterations: int = 60,
    ):
        super().__init__(config)
        from larynx_tpu.models.griffin_lim import GriffinLimState

        self.state = GriffinLimState(
            sample_rate=sample_rate,
            num_fft=num_fft,
            num_mels=num_mels,
            mel_fmin=mel_fmin,
            mel_fmax=mel_fmax,
            mel_scaling=mel_scaling,
            iterations=iterations,
        )
        self._counter = 0

    def mels_to_audio(
        self,
        mels: np.ndarray,
        settings: typing.Optional[SettingsType] = None,
    ) -> np.ndarray:
        mels = np.asarray(mels, dtype=np.float32)
        if mels.ndim == 2:
            mels = mels[None]
        self._counter += 1
        key = jax.random.PRNGKey(self._counter)
        audio = self.state(jnp.asarray(mels), key)
        return np.asarray(audio).squeeze(0)
