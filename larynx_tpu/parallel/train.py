"""Sharded GlowTTS training step (data parallel + encoder tensor parallel).

optax Adam with the Noam schedule + value clipping matching the reference
training config fields (glow_tts/config.py:64-124: betas (0.9, 0.98),
eps 1e-9, grad_clip 5.0, warmup_steps 4000, scheduler "noam").
"""

import typing
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from larynx_tpu.models.glow_tts.config import GlowTTSConfig
from larynx_tpu.models.glow_tts.training import training_forward
from larynx_tpu.parallel.mesh import glow_param_specs


def noam_schedule(
    d_model: int, warmup_steps: int = 4000, scale: float = 1.0
) -> optax.Schedule:
    """lr(step) = scale * d^-0.5 * min(step^-0.5, step * warmup^-1.5)."""

    def schedule(step):
        step = jnp.maximum(step, 1).astype(jnp.float32)
        return (
            scale
            * d_model**-0.5
            * jnp.minimum(step**-0.5, step * warmup_steps**-1.5)
        )

    return schedule


def make_optimizer(
    cfg: GlowTTSConfig,
    learning_rate_scale: float = 1.0,
    warmup_steps: int = 4000,
    grad_clip: float = 5.0,
    betas: typing.Tuple[float, float] = (0.9, 0.98),
    eps: float = 1e-9,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip(grad_clip),  # value clip, matching clip_grad_value_
        optax.adam(
            learning_rate=noam_schedule(
                cfg.hidden_channels, warmup_steps, learning_rate_scale
            ),
            b1=betas[0],
            b2=betas[1],
            eps=eps,
        ),
    )


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: typing.Any
    opt_state: typing.Any
    step: jnp.ndarray


def make_train_step(
    cfg: GlowTTSConfig,
    optimizer: optax.GradientTransformation,
    mesh: typing.Optional[Mesh] = None,
):
    """Build a jitted (optionally mesh-sharded) training step.

    Batch: dict with ids [B,T] int32, id_lengths [B], mels [B,M,C] float32,
    mel_lengths [B].  With a mesh, batches are sharded over the data axis
    and parameters per :func:`glow_param_specs`; XLA inserts the gradient
    all-reduces and TP collectives.
    """

    def train_step(state: TrainState, batch):
        if mesh is not None:
            batch = {
                k: jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
                )
                for k, v in batch.items()
            }

        def loss_fn(params):
            loss, metrics = training_forward(
                params,
                cfg,
                batch["ids"],
                batch["id_lengths"],
                batch["mels"],
                batch["mel_lengths"],
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        if mesh is not None:
            specs = glow_param_specs(new_params)
            new_params = jax.tree.map(
                lambda leaf, spec: jax.lax.with_sharding_constraint(
                    leaf, NamedSharding(mesh, spec)
                ),
                new_params,
                specs,
            )
        return (
            TrainState(
                params=new_params,
                opt_state=new_opt_state,
                step=state.step + 1,
            ),
            metrics,
        )

    jitted = jax.jit(train_step)

    def run(state: TrainState, batch):
        if mesh is not None:
            with mesh:
                return jitted(state, batch)
        return jitted(state, batch)

    return run


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
    )
