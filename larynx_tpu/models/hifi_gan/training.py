"""HiFi-GAN adversarial training step (training lives in external repos for
the reference; this is the TPU-native equivalent).

Standard HiFi-GAN objective: LSGAN discriminator/generator losses over the
multi-period + multi-scale discriminators, feature-matching loss, and a
45x-weighted L1 mel loss — jitted, static segment shapes.
"""

import typing
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from larynx_tpu.audio import AudioSettings, mel_basis
import larynx_tpu.dsp.stft as dsp
from larynx_tpu.models.hifi_gan import discriminators as disc
from larynx_tpu.models.hifi_gan import model as gen_model
from larynx_tpu.models.hifi_gan.config import HiFiGanConfig

MEL_LOSS_WEIGHT = 45.0


def log_mel(audio: jnp.ndarray, settings: AudioSettings, basis) -> jnp.ndarray:
    """HiFi-GAN-style log-mel for the reconstruction loss: [B, T] ->
    [B, n_mels, M] = log(clamp(mel_basis @ |STFT|, 1e-5))."""
    mag, _ = dsp.stft_magnitude_phase(
        audio, settings.filter_length, settings.hop_length
    )
    mel = jnp.einsum("mf,bft->bmt", basis, mag)
    return jnp.log(jnp.clip(mel, 1e-5, None))


@jax.tree_util.register_dataclass
@dataclass
class GanTrainState:
    gen_params: typing.Any
    disc_params: typing.Any
    gen_opt: typing.Any
    disc_opt: typing.Any
    step: jnp.ndarray


def init_gan_state(
    key: jax.Array,
    cfg: HiFiGanConfig,
    gen_optimizer: optax.GradientTransformation,
    disc_optimizer: optax.GradientTransformation,
) -> GanTrainState:
    k1, k2 = jax.random.split(key)
    gen_params = gen_model.init_params(k1, cfg)
    disc_params = disc.init_discriminators(k2)
    return GanTrainState(
        gen_params=gen_params,
        disc_params=disc_params,
        gen_opt=gen_optimizer.init(gen_params),
        disc_opt=disc_optimizer.init(disc_params),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def make_gan_train_step(
    cfg: HiFiGanConfig,
    settings: AudioSettings,
    gen_optimizer: optax.GradientTransformation,
    disc_optimizer: optax.GradientTransformation,
    mesh=None,
):
    """Build the jitted adversarial step.

    Batch: {"mels": [B, M, n_mels] log-mels, "audio": [B, M*upsample]}.
    One step = discriminator update on (real, detached fake), then
    generator update on adversarial + feature-matching + mel losses —
    matching the original HiFi-GAN training loop ordering.

    With ``mesh``, the step is data-parallel over the ``data`` axis:
    the batch shards by row, generator + discriminator parameters are
    replicated, and XLA inserts the gradient all-reduces — symmetric
    with the GlowTTS sharded step (parallel/train.py).  B must be a
    multiple of the data-axis size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    basis = jnp.asarray(
        mel_basis(
            settings.sample_rate,
            settings.filter_length,
            settings.mel_channels,
            settings.mel_fmin,
            settings.mel_fmax,
        )
    )

    def train_step(state: GanTrainState, batch):
        mels = batch["mels"]
        real = batch["audio"]
        if mesh is not None:
            row = lambda v: NamedSharding(
                mesh, P("data", *([None] * (v.ndim - 1)))
            )
            mels = jax.lax.with_sharding_constraint(mels, row(mels))
            real = jax.lax.with_sharding_constraint(real, row(real))

        fake = gen_model.generator(state.gen_params, cfg, mels)
        fake_detached = jax.lax.stop_gradient(fake)

        # ---- discriminator update
        def d_loss_fn(disc_params):
            sr_p, sg_p, _, _ = disc.multi_period(disc_params, real, fake_detached)
            sr_s, sg_s, _, _ = disc.multi_scale(disc_params, real, fake_detached)
            return disc.discriminator_loss(sr_p, sg_p) + disc.discriminator_loss(
                sr_s, sg_s
            )

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_updates, disc_opt = disc_optimizer.update(
            d_grads, state.disc_opt, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- generator update (against the updated discriminator)
        def g_loss_fn(gen_params):
            fake_g = gen_model.generator(gen_params, cfg, mels)
            sr_p, sg_p, fr_p, fg_p = disc.multi_period(disc_params, real, fake_g)
            sr_s, sg_s, fr_s, fg_s = disc.multi_scale(disc_params, real, fake_g)
            adv = disc.generator_loss(sg_p) + disc.generator_loss(sg_s)
            fm = disc.feature_loss(fr_p, fg_p) + disc.feature_loss(fr_s, fg_s)
            mel_l1 = jnp.mean(
                jnp.abs(log_mel(fake_g, settings, basis) - log_mel(real, settings, basis))
            )
            total = adv + fm + MEL_LOSS_WEIGHT * mel_l1
            return total, {"adv": adv, "fm": fm, "mel_l1": mel_l1}

        (g_loss, parts), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.gen_params
        )
        g_updates, gen_opt = gen_optimizer.update(
            g_grads, state.gen_opt, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        if mesh is not None:
            # parameters stay replicated (they are tiny next to HBM;
            # SURVEY.md §2.4 — DP is the vocoder-training axis)
            replicate = lambda t: jax.tree.map(
                lambda leaf: jax.lax.with_sharding_constraint(
                    leaf, NamedSharding(mesh, P())
                ),
                t,
            )
            gen_params = replicate(gen_params)
            disc_params = replicate(disc_params)

        new_state = GanTrainState(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=gen_opt,
            disc_opt=disc_opt,
            step=state.step + 1,
        )
        metrics = {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "mel_l1": parts["mel_l1"],
            "fm_loss": parts["fm"],
            "adv_loss": parts["adv"],
        }
        return new_state, metrics

    jitted = jax.jit(train_step)

    def run(state: GanTrainState, batch):
        if mesh is not None:
            with mesh:
                return jitted(state, batch)
        return jitted(state, batch)

    return run
