"""Tacotron2 teacher-forced training step (the reference never shipped the
family — larynx/constants.py:22 — so there is no reference trainer; the
objective follows the NVIDIA recipe the enum points at).

Loss = MSE(mel_pre, target) + MSE(mel_post, target) + BCE(gate, stop),
all masked to each row's valid mel frames; gate targets are 1 from the
last valid frame on.  Jitted with static shapes; optional data-parallel
mesh exactly like the HiFi-GAN step (models/hifi_gan/training.py).
"""

import typing
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from larynx_tpu.models.tacotron2 import forward_teacher, init_params
from larynx_tpu.models.tacotron2.config import Tacotron2Config


@jax.tree_util.register_dataclass
@dataclass
class Tacotron2TrainState:
    params: typing.Any
    opt: typing.Any
    step: jnp.ndarray


def init_train_state(
    key: jax.Array,
    cfg: Tacotron2Config,
    optimizer: optax.GradientTransformation,
) -> Tacotron2TrainState:
    params = init_params(key, cfg)
    return Tacotron2TrainState(
        params=params,
        opt=optimizer.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def loss_fn(
    params,
    cfg: Tacotron2Config,
    batch: typing.Mapping[str, jnp.ndarray],
    key: typing.Optional[jax.Array] = None,
):
    """Batch: ids [B, T], id_lengths [B], mels [B, S, M], mel_lengths [B]."""
    mels = batch["mels"]
    bsz, s, _ = mels.shape
    mel_lengths = batch["mel_lengths"]
    frame_mask = (
        jnp.arange(s)[None, :] < mel_lengths[:, None]
    ).astype(mels.dtype)

    pre, post, gates = forward_teacher(
        params,
        cfg,
        batch["ids"],
        batch["id_lengths"],
        mels,
        train=True,
        key=key,
    )
    denom = jnp.maximum(jnp.sum(frame_mask), 1.0)
    m = frame_mask[..., None]
    mel_pre = jnp.sum(jnp.square(pre - mels) * m) / (denom * mels.shape[-1])
    mel_post = jnp.sum(jnp.square(post - mels) * m) / (denom * mels.shape[-1])
    # stop token: 1 from the final valid frame on (NVIDIA gate_padded)
    gate_target = (
        jnp.arange(s)[None, :] >= (mel_lengths - 1)[:, None]
    ).astype(gates.dtype)
    bce = optax.sigmoid_binary_cross_entropy(gates, gate_target)
    # padding frames keep target 1 (the model must hold the stop signal),
    # matching the NVIDIA loss which does NOT mask the gate term
    gate_loss = jnp.mean(bce)
    total = mel_pre + mel_post + gate_loss
    return total, {
        "mel_pre": mel_pre,
        "mel_post": mel_post,
        "gate": gate_loss,
    }


def make_train_step(
    cfg: Tacotron2Config,
    optimizer: optax.GradientTransformation,
    mesh=None,
):
    """Build the jitted teacher-forced step; with ``mesh``, data-parallel
    over the ``data`` axis with replicated parameters (DP is the right
    axis here: the model is ~28M params, the batch rows are independent)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def train_step(state: Tacotron2TrainState, batch, key):
        if mesh is not None:
            row = lambda v: NamedSharding(  # noqa: E731
                mesh, P("data", *([None] * (v.ndim - 1)))
            )
            batch = {
                k: jax.lax.with_sharding_constraint(v, row(v))
                for k, v in batch.items()
            }

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, cfg, batch, key
        )
        updates, opt = optimizer.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        if mesh is not None:
            params = jax.tree.map(
                lambda leaf: jax.lax.with_sharding_constraint(
                    leaf, NamedSharding(mesh, P())
                ),
                params,
            )
        new_state = Tacotron2TrainState(
            params=params, opt=opt, step=state.step + 1
        )
        return new_state, {"loss": loss, **parts}

    jitted = jax.jit(train_step)

    def run(state: Tacotron2TrainState, batch, key):
        if mesh is not None:
            with mesh:
                return jitted(state, batch, key)
        return jitted(state, batch, key)

    return run
