"""Training-path tests: MAS parity vs the reference numpy oracle, loss
parity, and a sharded train step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from larynx_tpu.models.glow_tts import GlowTTSConfig, init_params
from larynx_tpu.models.glow_tts.training import (
    duration_loss,
    maximum_path,
    mle_loss,
    training_forward,
)

SMALL_CFG = GlowTTSConfig(
    num_symbols=46,
    hidden_channels=64,
    filter_channels=128,
    filter_channels_dp=64,
    mel_channels=80,
    n_layers_enc=2,
    n_blocks_dec=2,
    n_block_layers=2,
    window_size=4,
    mean_only=True,
    prenet=True,
)


def _random_alignment_problem(seed, b=3, t_x=7, t_y=19):
    rng = np.random.default_rng(seed)
    value = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
    x_lengths = rng.integers(2, t_x + 1, size=b)
    y_lengths = rng.integers(t_x, t_y + 1, size=b)
    y_lengths = np.maximum(y_lengths, x_lengths)  # need y >= x for a path
    mask = np.zeros((b, t_x, t_y), dtype=np.float32)
    for i in range(b):
        mask[i, : x_lengths[i], : y_lengths[i]] = 1.0
    return value, mask


def test_maximum_path_matches_reference_oracle(reference_torch):
    import torch

    from glow_tts.utils import maximum_path as ref_maximum_path

    for seed in range(5):
        value, mask = _random_alignment_problem(seed)
        ref = ref_maximum_path(
            torch.from_numpy(value), torch.from_numpy(mask)
        ).numpy()
        ours = np.asarray(
            maximum_path(jnp.asarray(value), jnp.asarray(mask))
        )
        np.testing.assert_array_equal(ours, ref, err_msg=f"seed={seed}")


def test_losses_match_reference_oracle(reference_torch):
    import torch

    from glow_tts.utils import duration_loss as ref_dur
    from glow_tts.utils import mle_loss as ref_mle

    rng = np.random.default_rng(3)
    b, m, c = 2, 12, 8
    z = rng.standard_normal((b, m, c)).astype(np.float32)
    mu = rng.standard_normal((b, m, c)).astype(np.float32)
    logs = rng.standard_normal((b, m, c)).astype(np.float32) * 0.1
    logdet = rng.standard_normal(b).astype(np.float32)
    mask = np.ones((b, m), dtype=np.float32)
    mask[1, 9:] = 0
    z = z * mask[..., None]

    ours = float(
        mle_loss(
            jnp.asarray(z), jnp.asarray(mu * mask[..., None]),
            jnp.asarray(logs * mask[..., None]), jnp.asarray(logdet),
            jnp.asarray(mask),
        )
    )
    # reference shape [B, C, M]; its loss sums over everything and divides
    # by sum(ones*mask) where mask broadcast over channels
    t = lambda x: torch.from_numpy(np.swapaxes(x, 1, 2).copy())
    ref = float(
        ref_mle(
            t(z), t(mu * mask[..., None]), t(logs * mask[..., None]),
            torch.from_numpy(logdet),
            torch.from_numpy(mask[:, None, :].copy()),
        )
    )
    assert abs(ours - ref) < 1e-4

    logw = rng.standard_normal((b, 7)).astype(np.float32)
    logw_hat = rng.standard_normal((b, 7)).astype(np.float32)
    lengths = np.array([7, 5], dtype=np.int32)
    ours_d = float(
        duration_loss(jnp.asarray(logw), jnp.asarray(logw_hat), jnp.asarray(lengths))
    )
    ref_d = float(
        ref_dur(
            torch.from_numpy(logw), torch.from_numpy(logw_hat),
            torch.from_numpy(lengths),
        )
    )
    assert abs(ours_d - ref_d) < 1e-5


def _make_batch(rng, b=4, t=12, m=32, c=80):
    return {
        "ids": jnp.asarray(
            rng.integers(1, SMALL_CFG.num_symbols, size=(b, t)), dtype=jnp.int32
        ),
        "id_lengths": jnp.asarray(
            rng.integers(6, t + 1, size=b), dtype=jnp.int32
        ),
        "mels": jnp.asarray(
            rng.standard_normal((b, m, c)).astype(np.float32)
        ),
        "mel_lengths": jnp.asarray(
            rng.integers(t, m + 1, size=b), dtype=jnp.int32
        ),
    }


def test_training_forward_finite_and_grads():
    params = init_params(jax.random.PRNGKey(0), SMALL_CFG)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)

    def loss_fn(p):
        loss, _ = training_forward(
            p, SMALL_CFG, batch["ids"], batch["id_lengths"],
            batch["mels"], batch["mel_lengths"],
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    grad_norms = jax.tree.map(lambda g: float(jnp.sum(jnp.square(g))), grads)
    total = sum(jax.tree.leaves(grad_norms))
    assert np.isfinite(total) and total > 0


def test_sharded_train_step_runs_on_mesh():
    """Full train step over a (4, 2) data x model CPU mesh."""
    from larynx_tpu.parallel import (
        TrainState,
        make_mesh,
        make_train_step,
    )
    from larynx_tpu.parallel.mesh import shard_params
    from larynx_tpu.parallel.train import init_train_state, make_optimizer

    mesh = make_mesh(8, model_parallel=2)
    params = init_params(jax.random.PRNGKey(0), SMALL_CFG)
    params = shard_params(params, mesh)
    optimizer = make_optimizer(SMALL_CFG)
    state = init_train_state(params, optimizer)
    train_step = make_train_step(SMALL_CFG, optimizer, mesh=mesh)

    rng = np.random.default_rng(1)
    batch = _make_batch(rng, b=8)
    losses = []
    for _ in range(3):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 3
    # overfitting a single batch must reduce the loss
    for _ in range(10):
        state, metrics = train_step(state, batch)
    assert float(metrics["loss"]) < losses[0]


def test_actnorm_ddi_init_normalizes():
    """After data-dependent init, each ActNorm's output over the init batch
    is ~zero-mean/unit-variance (the reference's ddi semantics,
    glow_tts/layers.py:204-221)."""
    import jax.numpy as jnp

    from larynx_tpu.models.glow_tts import flows
    from larynx_tpu.models.glow_tts.training import actnorm_ddi_init

    params = init_params(jax.random.PRNGKey(3), SMALL_CFG)
    rng = np.random.default_rng(3)
    mels = jnp.asarray(
        (rng.standard_normal((4, 32, 80)) * 3 + 1).astype(np.float32)
    )
    mel_lengths = jnp.asarray([32, 28, 30, 24], dtype=jnp.int32)

    params2 = actnorm_ddi_init(params, SMALL_CFG, mels, mel_lengths)

    # re-run the forward and check the first block's actnorm output stats
    y_mask = (jnp.arange(32)[None, :] < mel_lengths[:, None]).astype(jnp.float32)
    x, sq_mask = flows.squeeze(mels, y_mask, SMALL_CFG.n_sqz)
    block0 = jax.tree.map(lambda leaf: leaf[0], params2["decoder"])
    z, _ = flows.actnorm(block0["actnorm"], x, sq_mask, reverse=False)
    mask3 = np.asarray(sq_mask)[..., None]
    z = np.asarray(z)
    mean = (z * mask3).sum((0, 1)) / mask3.sum((0, 1))
    var = ((z - mean) ** 2 * mask3).sum((0, 1)) / mask3.sum((0, 1))
    np.testing.assert_allclose(mean, 0.0, atol=1e-4)
    np.testing.assert_allclose(var, 1.0, atol=1e-3)


def test_actnorm_ddi_init_uses_speaker_conditioning():
    """For a multi-speaker model the warmup forward must run the couplings
    with the batch's speaker embeddings: later blocks see conditioned
    activations, so their init differs from the unconditioned run."""
    import dataclasses

    import jax.numpy as jnp

    from larynx_tpu.models.glow_tts.training import actnorm_ddi_init

    cfg = dataclasses.replace(SMALL_CFG, n_speakers=4, gin_channels=32)
    params = init_params(jax.random.PRNGKey(3), cfg)
    assert "cond_w" in params["decoder"]["coupling"]["wn"]
    # fresh couplings have zero-init end convs (identity transform), so
    # conditioning only shows once training has moved them — simulate that
    params["decoder"]["coupling"]["end_w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(9),
        params["decoder"]["coupling"]["end_w"].shape,
    )
    rng = np.random.default_rng(4)
    mels = jnp.asarray(
        (rng.standard_normal((4, 32, 80)) * 3 + 1).astype(np.float32)
    )
    mel_lengths = jnp.asarray([32, 28, 30, 24], dtype=jnp.int32)
    speaker_ids = jnp.asarray([0, 1, 2, 3], dtype=jnp.int32)

    with_g = actnorm_ddi_init(params, cfg, mels, mel_lengths, speaker_ids)
    without_g = actnorm_ddi_init(params, cfg, mels, mel_lengths)

    # block 0 sees the raw input either way; later blocks must differ
    logs_w = np.asarray(with_g["decoder"]["actnorm"]["logs"])
    logs_wo = np.asarray(without_g["decoder"]["actnorm"]["logs"])
    np.testing.assert_allclose(logs_w[0], logs_wo[0], atol=1e-6)
    assert np.abs(logs_w[1:] - logs_wo[1:]).max() > 1e-4
