"""HiFi-GAN bias denoiser (spectral subtraction), fully on device.

Reference semantics: larynx/hifi_gan.py:171-203 — the vocoder's "bias"
signature is obtained by vocoding an 88-frame zero mel; at synthesis time
the first STFT frame's magnitude spectrum of that bias audio is subtracted
(scaled by ``denoiser_strength``) from the output's magnitude spectrum,
clipped at zero, and the waveform re-synthesized with the original phase.
"""

import jax.numpy as jnp

import larynx_tpu.dsp.stft as dsp

BIAS_MEL_FRAMES = 88


def compute_bias_spec(
    bias_audio: jnp.ndarray, fft_size: int = 1024, hop: int = 256
) -> jnp.ndarray:
    """bias audio [B, T] -> bias magnitude spectrum [B, n_freq, 1].

    (larynx/hifi_gan.py:201-203: first STFT frame only)
    """
    mag, _ = dsp.stft_magnitude_phase(bias_audio, fft_size, hop)
    return mag[:, :, 0:1]


def denoise(
    audio: jnp.ndarray,
    bias_spec: jnp.ndarray,
    strength: jnp.ndarray,
    fft_size: int = 1024,
    hop: int = 256,
) -> jnp.ndarray:
    """Spectral subtraction (larynx/hifi_gan.py:171-179).

    audio: [B, T]; bias_spec: [B or 1, n_freq, 1]; strength: scalar.
    """
    mag, phase = dsp.stft_magnitude_phase(audio, fft_size, hop)
    mag = jnp.clip(mag - bias_spec * strength, 0.0, None)
    return dsp.inverse_magnitude_phase(mag, phase, fft_size, hop)
