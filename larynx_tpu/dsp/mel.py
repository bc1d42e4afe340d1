"""Device-side mel post-processing chain.

JAX mirror of the host-side :class:`larynx_tpu.audio.AudioSettings` methods,
fused into the synthesis graph so mels never leave the device between the
acoustic model and the vocoder (the reference round-trips through numpy at
larynx/__init__.py:242-249).
"""

import jax.numpy as jnp

from larynx_tpu.audio import AudioSettings


def mel_postprocess(mels: jnp.ndarray, settings: AudioSettings) -> jnp.ndarray:
    """denormalize -> db_to_amp -> dynamic range compression, per config flags.

    This is the exact chain applied between ``phonemes_to_mels`` and
    ``mels_to_audio`` in the reference pipeline (larynx/__init__.py:242-249).
    All branches are resolved at trace time from the (static) settings.
    """
    x = mels
    if settings.signal_norm:
        if settings.symmetric_norm:
            if settings.clip_norm:
                x = jnp.clip(x, -settings.max_norm, settings.max_norm)
            x = (
                (x + settings.max_norm)
                * -settings.min_level_db
                / (2 * settings.max_norm)
            ) + settings.min_level_db
        else:
            if settings.clip_norm:
                x = jnp.clip(x, 0, settings.max_norm)
            x = (x * -settings.min_level_db / settings.max_norm) + settings.min_level_db
        x = x + settings.ref_level_db

    if settings.convert_db_to_amp:
        x = jnp.power(10.0, x / settings.spec_gain)

    if settings.do_dynamic_range_compression:
        x = jnp.log(jnp.clip(x, 1e-5, None))

    return x


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0) -> jnp.ndarray:
    return jnp.exp(x) / C


def linear_from_mel(
    mels: jnp.ndarray,
    mel_basis: jnp.ndarray,
    mel_scaling: float = 1000.0,
) -> jnp.ndarray:
    """Mel [B, n_mels, T] -> linear magnitude [B, n_freq, T] via pseudo-inverse.

    Matches larynx/griffin_lim.py:40-60: dynamic-range decompress, multiply by
    the (transposed) mel basis, scale.  ``mel_basis`` is [n_mels, n_freq].
    """
    amp = dynamic_range_decompression(mels)
    # [B, T, n_mels] @ [n_mels, n_freq] -> [B, T, n_freq]
    spec = jnp.einsum(
        "bmt,mf->bft", amp, mel_basis, preferred_element_type=jnp.float32
    )
    return spec * mel_scaling
