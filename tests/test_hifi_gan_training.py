"""HiFi-GAN adversarial training smoke test."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from larynx_tpu.audio import AudioSettings
from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan.training import (
    init_gan_state,
    log_mel,
    make_gan_train_step,
)

SMALL_CFG = HiFiGanConfig(
    resblock="2",
    upsample_rates=(8, 8, 4),
    upsample_kernel_sizes=(16, 16, 8),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
)


def test_gan_train_step_runs_and_updates():
    settings = AudioSettings()
    gen_opt = optax.adam(2e-4, b1=0.8, b2=0.99)
    disc_opt = optax.adam(2e-4, b1=0.8, b2=0.99)
    state = init_gan_state(jax.random.PRNGKey(0), SMALL_CFG, gen_opt, disc_opt)
    train_step = make_gan_train_step(SMALL_CFG, settings, gen_opt, disc_opt)

    rng = np.random.default_rng(0)
    frames = 16
    batch = {
        "mels": jnp.asarray(
            rng.standard_normal((2, frames, 80)).astype(np.float32)
        ),
        "audio": jnp.asarray(
            (rng.standard_normal((2, frames * 256)) * 0.1).astype(np.float32)
        ),
    }

    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.gen_params)
    metrics = None
    for _ in range(2):
        state, metrics = train_step(state, batch)

    for key in ("d_loss", "g_loss", "mel_l1", "fm_loss", "adv_loss"):
        assert np.isfinite(float(metrics[key])), key
    assert int(state.step) == 2

    # both networks actually moved
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.gen_params,
        before,
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_log_mel_shapes():
    from larynx_tpu.audio import mel_basis

    settings = AudioSettings()
    basis = jnp.asarray(mel_basis(22050, 1024, 80, 0.0, 8000.0))
    audio = jnp.zeros((2, 8192))
    mel = log_mel(audio, settings, basis)
    assert mel.shape[0] == 2 and mel.shape[1] == 80
    # silence maps to log(1e-5)
    np.testing.assert_allclose(np.asarray(mel), np.log(1e-5), rtol=1e-5)


def test_gan_train_step_dp_mesh(monkeypatch):
    """DP-sharded adversarial step over the 8-device mesh: batch rows
    shard, generator/discriminator params stay replicated, losses finite
    and matching the single-device step (VERDICT round-3 item 10 —
    symmetric with tests/test_training.py's sharded glow coverage)."""
    from larynx_tpu.parallel.mesh import serving_mesh

    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    assert mesh is not None and mesh.shape["data"] == 8

    settings = AudioSettings()
    gen_opt = optax.adam(2e-4, b1=0.8, b2=0.99)
    disc_opt = optax.adam(2e-4, b1=0.8, b2=0.99)
    state = init_gan_state(jax.random.PRNGKey(0), SMALL_CFG, gen_opt, disc_opt)
    sharded = make_gan_train_step(
        SMALL_CFG, settings, gen_opt, disc_opt, mesh=mesh
    )
    single = make_gan_train_step(SMALL_CFG, settings, gen_opt, disc_opt)

    rng = np.random.default_rng(0)
    frames = 16
    batch = {
        "mels": jnp.asarray(
            rng.standard_normal((8, frames, 80)).astype(np.float32)
        ),
        "audio": jnp.asarray(
            (rng.standard_normal((8, frames * 256)) * 0.1).astype(np.float32)
        ),
    }

    state_s, metrics_s = sharded(state, batch)
    state_r, metrics_r = single(state, batch)
    for key in ("d_loss", "g_loss", "mel_l1", "fm_loss", "adv_loss"):
        ms, mr = float(metrics_s[key]), float(metrics_r[key])
        assert np.isfinite(ms), key
        # the partitioned reduction may round differently at ~1e-6
        assert abs(ms - mr) < 1e-3 * max(1.0, abs(mr)), (key, ms, mr)
    assert int(state_s.step) == 1

    # updated parameters agree with the single-device step
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state_s.gen_params,
        state_r.gen_params,
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4
