"""Griffin-Lim vocoder: mel -> waveform entirely on device.

Reference semantics: larynx/griffin_lim.py:22-76 — dynamic-range decompress,
project mels to linear magnitude through the (transposed) mel basis, scale by
1000, drop the last frame, then 60 iterations of phase re-estimation.  Here
the whole loop runs as one jitted XLA program (lax.fori_loop + batched
rFFT/irFFT) instead of 61 host-side numpy STFT round trips.
"""

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np

from larynx_tpu.audio import mel_basis as make_mel_basis
import larynx_tpu.dsp.mel as dspmel
import larynx_tpu.dsp.stft as dsp


@functools.partial(
    jax.jit, static_argnames=("fft_size", "hop", "n_iters")
)
def mels_to_audio(
    mels: jnp.ndarray,
    basis: jnp.ndarray,
    key: typing.Optional[jax.Array] = None,
    initial_phase: typing.Optional[jnp.ndarray] = None,
    mel_scaling: float = 1000.0,
    fft_size: int = 1024,
    hop: int = 256,
    n_iters: int = 60,
) -> jnp.ndarray:
    """mels [B, n_mels, T] (dynamic-range compressed) -> audio [B, T'].

    ``basis`` is the [n_mels, n_freq] Slaney mel filter bank.  Phase starts
    from ``initial_phase`` if given (parity tests) else uniformly at random
    from ``key``.
    """
    spec = dspmel.linear_from_mel(mels, basis, mel_scaling)  # [B, n_freq, T]
    spec = spec[:, :, :-1]  # reference drops the final frame (:57)
    return dsp.griffin_lim(
        spec, key, fft_size, hop, n_iters, initial_phase=initial_phase
    )


class GriffinLimState:
    """Host-side convenience wrapper holding the precomputed mel basis."""

    def __init__(
        self,
        sample_rate: int = 22050,
        num_fft: int = 1024,
        num_mels: int = 80,
        mel_fmin: float = 0.0,
        mel_fmax: float = 8000.0,
        mel_scaling: float = 1000.0,
        iterations: int = 60,
        hop: int = 256,
    ):
        self.basis = jnp.asarray(
            make_mel_basis(sample_rate, num_fft, num_mels, mel_fmin, mel_fmax)
        )
        self.mel_scaling = mel_scaling
        self.iterations = iterations
        self.num_fft = num_fft
        self.hop = hop

    def __call__(self, mels: jnp.ndarray, key: jax.Array) -> np.ndarray:
        return mels_to_audio(
            mels,
            self.basis,
            key=key,
            mel_scaling=self.mel_scaling,
            fft_size=self.num_fft,
            hop=self.hop,
            n_iters=self.iterations,
        )
