"""Data-parallel serving over a device mesh.

For fleet serving, sentence batches are sharded over the mesh's data axis:
each chip synthesizes its shard of the batch, XLA handling the (trivial)
collectives.  Model parameters are replicated — TTS models are tiny
relative to HBM, so DP is the right serving axis (SURVEY.md §2.4).
"""

import typing

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from larynx_tpu.models.glow_tts import model as glow_model
from larynx_tpu.models.glow_tts.config import GlowTTSConfig
from larynx_tpu.models.hifi_gan import model as hifi_model
from larynx_tpu.models.hifi_gan.config import HiFiGanConfig


def make_sharded_synthesis(
    glow_cfg: GlowTTSConfig,
    vocoder_cfg: typing.Optional[HiFiGanConfig],
    mesh: Mesh,
    mel_max_length: int,
    audio_settings=None,
):
    """Build a jitted full-pipeline synthesis step sharded over ``data``.

    Returns ``fn(glow_params, voc_params, ids [B,T], lengths [B], key)``
    -> (audio [B, M*up] or mel [B, M, C], mel_lengths [B]).  B must be a
    multiple of the data-axis size.
    """
    data_sharding = NamedSharding(mesh, P("data"))

    def synth(glow_params, voc_params, ids, lengths, key, noise_scale):
        ids = jax.lax.with_sharding_constraint(
            ids, NamedSharding(mesh, P("data", None))
        )
        lengths = jax.lax.with_sharding_constraint(lengths, data_sharding)

        x_m, x_logs, _logw, w_ceil, y_lengths, _mask = glow_model.encode(
            glow_params, glow_cfg, ids, lengths
        )
        # mel bucket is static; y_lengths is clipped into it
        y_lengths = jnp.minimum(y_lengths, mel_max_length)
        mel, z_mask = glow_model.expand_and_decode(
            glow_params,
            glow_cfg,
            x_m,
            x_logs,
            w_ceil,
            y_lengths,
            key,
            mel_max_length=mel_max_length,
            noise_scale=noise_scale,
        )
        if voc_params is not None and vocoder_cfg is not None:
            if audio_settings is not None:
                import larynx_tpu.dsp.mel as dspmel

                mel_cm = jnp.swapaxes(mel, 1, 2)
                mel_cm = dspmel.mel_postprocess(mel_cm, audio_settings)
                mel = jnp.swapaxes(
                    jnp.where(
                        z_mask[:, None, :] > 0, mel_cm, jnp.log(1e-5)
                    ),
                    1,
                    2,
                )
            audio = hifi_model.generator(voc_params, vocoder_cfg, mel)
            return audio, y_lengths
        return mel, y_lengths

    jitted = jax.jit(synth)

    def run(glow_params, voc_params, ids, lengths, key, noise_scale=0.667):
        with mesh:
            return jitted(
                glow_params, voc_params, ids, lengths, key,
                jnp.float32(noise_scale),
            )

    return run
