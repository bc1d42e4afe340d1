"""Time-sharded single-utterance vocode (8 virtual CPU devices).

VERDICT round-3 item 2: row (data-parallel) sharding gives one long
utterance nothing — parallel/time_shard.py splits its vocode along TIME
with the streaming receptive-field halo, and the sharded int16 output
must equal the single-device batched program BIT-FOR-BIT.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from larynx_tpu.audio import AudioSettings
from larynx_tpu.models.glow_tts import GlowTTSConfig
from larynx_tpu.models.glow_tts.model import init_params as glow_init
from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan.model import init_params as hifi_init
from larynx_tpu.parallel.mesh import serving_mesh
from larynx_tpu.parallel.time_shard import make_time_sharded_vocode
from larynx_tpu.runtime.engine import SynthesisEngine, stream_halo_frames


@pytest.fixture(scope="module")
def small_models():
    glow_cfg = GlowTTSConfig(
        hidden_channels=64,
        filter_channels=128,
        filter_channels_dp=64,
        n_layers_enc=2,
        n_blocks_dec=2,
        n_block_layers=2,
    )
    hifi_cfg = HiFiGanConfig(
        resblock="2",
        upsample_initial_channel=32,
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (2, 6)),
    )
    key = jax.random.PRNGKey(0)
    return (
        glow_cfg,
        glow_init(key, glow_cfg),
        hifi_cfg,
        hifi_init(jax.random.fold_in(key, 1), hifi_cfg),
    )


SETTINGS = AudioSettings(
    signal_norm=True, max_norm=1.0, symmetric_norm=True, clip_norm=True
)


def _make_engine(small_models, mesh):
    glow_cfg, glow_params, hifi_cfg, hifi_params = small_models
    return SynthesisEngine(
        glow_params,
        glow_cfg,
        SETTINGS,
        vocoder_kind="hifi_gan",
        vocoder_params=hifi_params,
        vocoder_cfg=hifi_cfg,
        seed=7,
        mesh=mesh,
    )


def _random_mel(m=512, y_len=437, c=80):
    rng = np.random.default_rng(42)
    mel = rng.uniform(-1.0, 1.0, size=(1, m, c)).astype(np.float32)
    z_mask = (np.arange(m) < y_len).astype(np.float32)[None]
    return jnp.asarray(mel), jnp.asarray(z_mask)


def test_time_sharded_vocode_bit_exact(small_models, monkeypatch):
    """Same raw mel through the single-device batched vocode program and
    the 8-way time-sharded one: int16 outputs identical up to single-LSB
    rounding on a <0.1% sample fraction — the same guarantee the
    streaming chunker gives (tests/test_streaming.py): XLA's float conv
    summation order differs across window widths at the ~1 ulp level, so
    exact bit equality across different widths is not a defined target;
    every surviving diff is one int16 step."""
    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    assert mesh is not None and mesh.shape["data"] == 8

    _, _, hifi_cfg, hifi_params = small_models
    single = _make_engine(small_models, mesh=None)

    mel, z_mask = _random_mel()
    zero_bias = jnp.zeros((1, 1, 1))
    zero_strength = jnp.zeros((1, 1, 1))
    ref = np.asarray(
        single._vocode(
            hifi_params, mel, z_mask, zero_bias, zero_strength, False
        )
    )

    sharded_fn = make_time_sharded_vocode(
        hifi_cfg,
        SETTINGS,
        mesh,
        halo=stream_halo_frames(hifi_cfg),
        axis="data",
    )
    got = np.asarray(sharded_fn(hifi_params, mel, z_mask))

    assert got.shape == ref.shape
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert np.max(diff) <= 1, np.max(diff)
    assert np.mean(diff != 0) < 1e-3, np.mean(diff != 0)


def test_time_sharded_vocode_needs_halo(small_models, monkeypatch):
    """With halo=0 the chunk seams diverge — proves the halo is doing
    the work (guards against a future 'optimization' dropping it)."""
    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    _, _, hifi_cfg, hifi_params = small_models
    single = _make_engine(small_models, mesh=None)

    mel, z_mask = _random_mel()
    ref = np.asarray(
        single._vocode(
            hifi_params, mel, z_mask,
            jnp.zeros((1, 1, 1)), jnp.zeros((1, 1, 1)), False,
        )
    )
    no_halo = make_time_sharded_vocode(
        hifi_cfg, SETTINGS, mesh, halo=0, axis="data"
    )
    got = np.asarray(no_halo(hifi_params, mel, z_mask))
    assert not np.array_equal(got, ref)


def test_time_sharded_vocode_denoised(small_models, monkeypatch):
    """The denoise path (global STFT stage over the time-sharded float
    chunks) matches the single-device denoised program to ~1 step."""
    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    _, _, hifi_cfg, hifi_params = small_models
    single = _make_engine(small_models, mesh=None)

    mel, z_mask = _random_mel()
    bias = single._get_bias_spec()
    strength = jnp.full((1, 1, 1), 0.01)
    ref = np.asarray(
        single._vocode(hifi_params, mel, z_mask, bias, strength, True)
    )
    sharded_fn = make_time_sharded_vocode(
        hifi_cfg, SETTINGS, mesh,
        halo=stream_halo_frames(hifi_cfg), axis="data",
    )
    got = np.asarray(
        sharded_fn(hifi_params, mel, z_mask, bias, strength, denoise=True)
    )
    assert got.shape == ref.shape
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert np.max(diff) <= 2, np.max(diff)
    assert np.mean(diff != 0) < 0.02, np.mean(diff != 0)


def test_mesh_engine_single_row_time_shards(small_models, monkeypatch):
    """A 1-sentence batch on a mesh engine routes through the
    time-sharded path and matches the single-device engine exactly
    (decode runs with global RNG semantics under sharded jit)."""
    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    eng = _make_engine(small_models, mesh=mesh)
    single = _make_engine(small_models, mesh=None)

    ids = [np.arange(1, 40, dtype=np.int64)]
    ref = single.synthesize_batch(ids, seed=5, length_scale=2.0)
    out = eng.synthesize_batch(ids, seed=5, length_scale=2.0)
    assert len(out) == len(ref) == 1
    assert out[0].shape == ref[0].shape
    diff = np.abs(out[0].astype(np.int32) - ref[0].astype(np.int32))
    assert np.max(diff) <= 2, np.max(diff)


def test_mesh_engine_single_row_denoised(small_models, monkeypatch):
    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    eng = _make_engine(small_models, mesh=mesh)
    single = _make_engine(small_models, mesh=None)

    ids = [np.arange(1, 30, dtype=np.int64)]
    ref = single.synthesize_batch(
        ids, seed=5, length_scale=2.0, denoiser_strength=0.01
    )
    out = eng.synthesize_batch(
        ids, seed=5, length_scale=2.0, denoiser_strength=0.01
    )
    assert out[0].shape == ref[0].shape
    diff = np.abs(out[0].astype(np.int32) - ref[0].astype(np.int32))
    assert np.max(diff) <= 2, np.max(diff)


def test_time_shard_length_gate(small_models, monkeypatch):
    """VERDICT round-4 item 4: the time-shard route is gated by mel
    width — below the break-even (speedup = M/(M/N + 2*halo) from
    parallel/time_shard.py, gate 2*N*halo) a single-row mesh batch must
    take the row-sharded group path instead of paying the halo tax.
    Both routes produce the single-device waveform."""
    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    single = _make_engine(small_models, mesh=None)
    ids = [np.arange(1, 40, dtype=np.int64)]
    ref = single.synthesize_batch(ids, seed=5, length_scale=2.0)

    # force the gate ABOVE every bucket: short route = uniform groups
    monkeypatch.setenv("LARYNX_TPU_TIME_SHARD_MIN_FRAMES", "1000000")
    eng = _make_engine(small_models, mesh=mesh)
    assert eng._time_shard_min_frames == 1000000
    out = eng.synthesize_batch(ids, seed=5, length_scale=2.0)
    assert eng._time_shard_hits == 0
    assert out[0].shape == ref[0].shape
    assert np.max(np.abs(out[0].astype(np.int32) - ref[0].astype(np.int32))) <= 2

    # force the gate to zero: the time-sharded program must run
    monkeypatch.setenv("LARYNX_TPU_TIME_SHARD_MIN_FRAMES", "0")
    eng2 = _make_engine(small_models, mesh=mesh)
    out2 = eng2.synthesize_batch(ids, seed=5, length_scale=2.0)
    assert eng2._time_shard_hits == 1
    assert np.max(np.abs(out2[0].astype(np.int32) - ref[0].astype(np.int32))) <= 2

    # default gate derives from the documented model: 2 * N * halo
    monkeypatch.delenv("LARYNX_TPU_TIME_SHARD_MIN_FRAMES")
    eng3 = _make_engine(small_models, mesh=mesh)
    hifi_cfg = small_models[2]
    assert eng3._time_shard_min_frames == 2 * 8 * stream_halo_frames(hifi_cfg)


def test_grid_sharded_vocode_matches_batched(small_models, monkeypatch):
    """VERDICT round-4 item 6: a 3-row batch on the 2x4 rows-x-time grid
    matches the single-device batched program within one int16 step."""
    from larynx_tpu.parallel.time_shard import make_grid_sharded_vocode

    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    _, _, hifi_cfg, hifi_params = small_models
    single = _make_engine(small_models, mesh=None)

    rng = np.random.default_rng(7)
    mel = jnp.asarray(
        rng.uniform(-1.0, 1.0, size=(3, 512, 80)).astype(np.float32)
    )
    lens = np.array([437, 512, 129])
    z_mask = jnp.asarray(
        (np.arange(512)[None, :] < lens[:, None]).astype(np.float32)
    )
    ref = np.asarray(
        single._vocode(
            hifi_params, mel, z_mask,
            jnp.zeros((1, 1, 1)), jnp.zeros((3, 1, 1)), False,
        )
    )
    grid_fn = make_grid_sharded_vocode(
        hifi_cfg, SETTINGS, list(mesh.devices.flat), 2, 4,
        halo=stream_halo_frames(hifi_cfg),
    )
    got = np.asarray(grid_fn(hifi_params, mel, z_mask))
    assert got.shape == ref.shape
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert np.max(diff) <= 1, np.max(diff)
    assert np.mean(diff != 0) < 1e-3, np.mean(diff != 0)


def test_grid_plan_fills_devices(small_models):
    """The plan never leaves a row shard with only padding, never loses
    to plain row sharding, and covers 1 < n_valid < 8 at long widths."""
    eng = _make_engine(small_models, mesh=None)
    eng._n_data = 8
    eng._ts_halo = 36
    for n_valid in range(2, 7):
        plan = eng._grid_vocode_plan(n_valid, 2048)
        assert plan is not None, n_valid
        n_rows, n_time = plan
        assert n_rows * n_time == 8
        rows_per = -(-n_valid // n_rows)
        # every row shard holds at least one real row
        assert (n_rows - 1) * rows_per < n_valid
        # and the grid strictly beats plain row sharding's work = m
        window = -(-2048 // n_time) + (2 * 36 if n_time > 1 else 0)
        assert rows_per * window < 2048
    # n_valid=7: 7 rows' halo tax exceeds one padding row — plain row
    # sharding genuinely wins, the plan correctly declines
    assert eng._grid_vocode_plan(7, 2048) is None
    # short widths: the halo tax loses -> fall back to the group path
    assert eng._grid_vocode_plan(3, 128) is None


def test_mesh_engine_partial_batch_uses_grid(small_models, monkeypatch):
    """An n_valid=3 batch on the mesh engine routes through the
    rows-x-time grid (hit counter) and matches the single-device engine
    within the +-1 LSB contract."""
    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    eng = _make_engine(small_models, mesh=mesh)
    single = _make_engine(small_models, mesh=None)

    ids = [
        np.arange(1, 40, dtype=np.int64),
        np.arange(3, 47, dtype=np.int64),
        np.arange(5, 31, dtype=np.int64),
    ]
    # long length_scale pushes every row past the grid's break-even
    ref = single.synthesize_batch(ids, seed=5, length_scale=6.0)
    out = eng.synthesize_batch(ids, seed=5, length_scale=6.0)
    assert eng._grid_shard_hits >= 1
    assert len(out) == len(ref) == 3
    for o, r in zip(out, ref):
        assert o.shape == r.shape
        diff = np.abs(o.astype(np.int32) - r.astype(np.int32))
        assert np.max(diff) <= 2, np.max(diff)


def test_waveglow_grid_vocode_matches_batched(small_models, monkeypatch):
    """WaveGlow sibling of the grid parity test: a 3-row batch on the
    2x4 rows-x-time grid (halo = the flows' chained WN receptive field,
    parallel/time_shard.py::waveglow_halo_frames) matches the
    single-device batched program within one int16 step."""
    import jax.numpy as jnp

    from larynx_tpu.models.waveglow import WaveGlowConfig
    from larynx_tpu.models.waveglow import model as wg
    from larynx_tpu.parallel.time_shard import (
        make_waveglow_grid_vocode,
        waveglow_halo_frames,
    )

    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    glow_cfg, glow_params, _, _ = small_models
    wg_cfg = WaveGlowConfig(
        mel_channels=80,
        flows=4,
        groups=8,
        early_every=2,
        early_size=2,
        wn_kernel_size=3,
        wn_channels=32,
        wn_layers=2,
        upsample_kernel=128,
        upsample_stride=64,
    )

    def perturbed(key, cfg):
        params = wg.init_params(key, cfg)
        for i, flow in enumerate(params["flows"]):
            k = jax.random.fold_in(key, 100 + i)
            flow["wn"]["end_w"] = 0.1 * jax.random.normal(
                k, flow["wn"]["end_w"].shape
            )
        return params

    wg_params = perturbed(jax.random.PRNGKey(3), wg_cfg)
    single = SynthesisEngine(
        glow_params, glow_cfg, SETTINGS,
        vocoder_kind="waveglow",
        vocoder_params=wg_params,
        vocoder_cfg=wg_cfg,
        seed=7,
    )

    rng = np.random.default_rng(11)
    m = 128
    mel = jnp.asarray(
        rng.uniform(-1.0, 1.0, size=(3, m, 80)).astype(np.float32)
    )
    lens = np.array([100, 128, 57])
    z_mask = jnp.asarray(
        (np.arange(m)[None, :] < lens[:, None]).astype(np.float32)
    )
    blocks = m * wg_cfg.upsample_stride // wg_cfg.groups
    z = 0.9 * jax.random.normal(jax.random.PRNGKey(5), (3, blocks, 8))
    z = jnp.where(
        (jnp.arange(blocks)[None, :]
         < (lens * wg_cfg.upsample_stride // wg_cfg.groups)[:, None]
         )[..., None],
        z, 0.0,
    )
    zero = jnp.zeros((1, 1, 1))
    strength = jnp.zeros((3, 1, 1))
    ref = np.asarray(
        single._vocode_gl(wg_params, mel, z_mask, z, zero, strength, False)
    )

    halo = waveglow_halo_frames(wg_cfg)
    assert halo == 4  # 4 flows x 3 blocks / 8 blocks-per-frame, +2 cond
    grid_fn = make_waveglow_grid_vocode(
        wg_cfg, SETTINGS, list(mesh.devices.flat), 2, 4, halo=halo
    )
    got = np.asarray(grid_fn(wg_params, mel, z_mask, z))
    assert got.shape == ref.shape
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert np.max(diff) <= 1, np.max(diff)
    assert np.mean(diff != 0) < 1e-3, np.mean(diff != 0)

    # halo=0 control: the receptive field crosses chunk seams
    no_halo = make_waveglow_grid_vocode(
        wg_cfg, SETTINGS, list(mesh.devices.flat), 2, 4, halo=0
    )
    got0 = np.asarray(no_halo(wg_params, mel, z_mask, z))
    assert not np.array_equal(got0, ref)


def test_waveglow_grid_plan_respects_big_halo(small_models):
    """The WaveGlow halo (~100 frames at wn_256) makes the grid decline
    at short mels and fire at long ones — the plan is family-aware."""
    from larynx_tpu.models.waveglow import WaveGlowConfig
    from larynx_tpu.parallel.time_shard import waveglow_halo_frames

    halo = waveglow_halo_frames(WaveGlowConfig())
    assert 90 <= halo <= 110  # 12 flows x 255 blocks / 32, +4 cond

    eng = _make_engine(small_models, mesh=None)
    eng._n_data = 8
    eng._ts_halo = 36
    # short mel: receptive-field tax loses to plain row sharding
    assert eng._grid_vocode_plan(3, 512, halo=halo) is None
    # long mel: time sharding pays even with the big halo
    plan = eng._grid_vocode_plan(3, 4096, halo=halo)
    assert plan is not None
    n_rows, n_time = plan
    assert n_rows * n_time == 8 and n_time > 1
