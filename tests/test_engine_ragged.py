"""Length-sorted ragged vocoding: equivalence with the uniform-width path.

Mixed-length batches sort rows by mel length and vocode each group at its
own bucketed frame width (less compute, fewer device->host bytes).  The
cropped per-sentence audio must be identical to vocoding every row at the
full batch bucket width: the only difference is how much trailing
silence-mel padding the conv halo sees, and the valid samples never depend
on it (mel past the valid frames is the silence constant either way).
"""

import numpy as np
import jax
import pytest

from larynx_tpu.audio import AudioSettings
from larynx_tpu.models.glow_tts import GlowTTSConfig
from larynx_tpu.models.glow_tts.model import init_params as glow_init
from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan.model import init_params as hifi_init
from larynx_tpu.runtime.engine import SynthesisEngine


@pytest.fixture(autouse=True)
def _reset_plan_gate_caches():
    """The ramp/merge gates are lru_cached env reads — clear them after
    every test so a monkeypatched LARYNX_TPU_RAMP_* value never leaks."""
    yield
    import larynx_tpu.runtime.engine as engine_module

    engine_module.ramp_first_group.cache_clear()
    engine_module.ramp_min_bytes.cache_clear()


@pytest.fixture(scope="module")
def engine():
    glow_cfg = GlowTTSConfig(
        num_symbols=48,
        hidden_channels=96,
        filter_channels=192,
        filter_channels_dp=64,
        n_layers_enc=2,
        n_blocks_dec=4,
    )
    voc_cfg = HiFiGanConfig(upsample_initial_channel=64)
    settings = AudioSettings(
        signal_norm=True, max_norm=1.0, symmetric_norm=True, clip_norm=True
    )
    key = jax.random.PRNGKey(0)
    return SynthesisEngine(
        glow_init(key, glow_cfg),
        glow_cfg,
        settings,
        vocoder_kind="hifi_gan",
        vocoder_params=hifi_init(jax.random.fold_in(key, 1), voc_cfg),
        vocoder_cfg=voc_cfg,
        seed=7,
        use_pallas=False,
        vocoder_half=False,
    )


@pytest.mark.parametrize("denoiser", [0.0, 0.02])
def test_synthesize_launch_matches_explicit_two_step(engine, denoiser):
    """synthesize_launch (the one-call decode+vocode dispatch used by the
    pipeline and the scheduler) must equal explicit decode_launch +
    vocode_launch."""
    rng = np.random.default_rng(2)
    ids = [rng.integers(1, 48, size=t).astype(np.int64) for t in (10, 14)]
    n = len(ids)

    enc_out, g = engine.encode_launch(ids, 2.0)
    y_lengths = np.asarray(enc_out[4])

    parts, b_rows = engine.synthesize_launch(
        enc_out, y_lengths, g, n, seed=5, batch_index=2,
        denoiser_strength=denoiser,
    )

    mel, z_mask, key = engine.decode_launch(
        enc_out, y_lengths, g, n, seed=5, batch_index=2
    )
    ref_parts = engine.vocode_launch(
        mel, z_mask, n, denoiser, key, y_lengths=y_lengths
    )
    rows = engine.crop_rows(
        engine.vocode_collect(parts, b_rows), y_lengths, n, denoiser
    )
    ref_rows = engine.crop_rows(
        engine.vocode_collect(ref_parts, mel.shape[0]), y_lengths, n, denoiser
    )
    for i, (a, r) in enumerate(zip(rows, ref_rows)):
        assert a.shape == r.shape, i
        diff = np.abs(a.astype(np.int32) - r.astype(np.int32))
        assert diff.max() <= 1, (i, diff.max())


@pytest.mark.parametrize("denoiser", [0.0, 0.01])
def test_ragged_matches_uniform(engine, denoiser, monkeypatch):
    import larynx_tpu.runtime.engine as engine_module

    # the test geometry is tiny, so the dispatch-bound small-batch merge
    # would collapse it into one group — force the width-split plan (the
    # production behavior for link-bound batches) to exercise raggedness
    monkeypatch.setenv("LARYNX_TPU_RAMP_MIN_BYTES", "0")
    engine_module.ramp_min_bytes.cache_clear()
    rng = np.random.default_rng(1)
    ids = [
        rng.integers(1, 48, size=t).astype(np.int64) for t in (8, 44, 17, 30)
    ]
    scales = [2.0, 6.0, 3.0, 5.0]
    n = len(ids)

    enc_out, g = engine.encode_launch(ids, scales)
    y_lengths = np.asarray(enc_out[4])
    mel, z_mask, key = engine.decode_launch(
        enc_out, y_lengths, g, n, noise_scale=0.0, seed=3
    )
    assert len(set(int(v) for v in y_lengths[:n])) > 1  # really mixed

    ragged = engine.vocode_launch(
        mel, z_mask, n, denoiser, key, y_lengths=y_lengths
    )
    uniform = engine.vocode_launch(mel, z_mask, n, denoiser, key)

    # the ragged path really ran narrower programs for the short rows
    widths = sorted({p[0].shape[-1] for p in ragged})
    assert len(widths) > 1

    rows_r = engine.crop_rows(
        engine.vocode_collect(ragged, mel.shape[0]), y_lengths, n, denoiser
    )
    rows_u = engine.crop_rows(
        engine.vocode_collect(uniform, mel.shape[0]), y_lengths, n, denoiser
    )
    for i, (a, b) in enumerate(zip(rows_r, rows_u)):
        assert a.shape == b.shape, i
        # XLA tiles convolutions differently at different widths, so float
        # results differ in the last ulp -> at most +-1 after int16 rounding
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert diff.max() <= 1, (i, diff.max())
        assert np.mean(diff > 0) < 0.01, (i, np.mean(diff > 0))


def test_predicted_bucket_matches_synced_path(engine):
    """synthesize_launch_predicted (decode dispatched on a learned bucket
    while y_lengths syncs) must produce the same audio as the classic
    sync-then-decode path — when the predicted bucket equals the exact
    one the result is bit-identical; a wider predicted bucket may differ
    by padded-program rounding only (same +-1 LSB contract as the bucket
    tests above)."""
    rng = np.random.default_rng(5)
    ids = [rng.integers(1, 48, size=t).astype(np.int64) for t in (12, 16)]
    n = len(ids)

    # classic path (also warms the frames-per-token estimator)
    engine._frames_per_token = 0.0
    enc_out, g = engine.encode_launch(ids, 1.0)
    y_lengths = np.asarray(enc_out[4])
    parts, b_rows = engine.synthesize_launch(
        enc_out, y_lengths, g, n, batch_index=0
    )
    ref = engine.crop_rows(engine.vocode_collect(parts, b_rows), y_lengths, n, 0.0)

    # seed the estimator with the observed ratio, then run predicted
    engine._frames_per_token = float(y_lengths[:n].max()) / max(
        len(s) for s in ids
    )
    before = engine._bucket_mispredicts
    enc_out2, g2 = engine.encode_launch(ids, 1.0)
    parts2, b_rows2, y2 = engine.synthesize_launch_predicted(
        enc_out2, g2, n, max_id_len=max(len(s) for s in ids),
        batch_index=0,
    )
    assert engine._bucket_mispredicts == before  # upper bound held
    got = engine.crop_rows(engine.vocode_collect(parts2, b_rows2), y2, n, 0.0)

    np.testing.assert_array_equal(y2, y_lengths)
    for a, b in zip(ref, got):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1)


def test_predicted_bucket_mispredict_falls_back(engine):
    """A too-small learned ratio must trigger the redispatch fallback and
    still produce audio identical to the classic path."""
    rng = np.random.default_rng(6)
    ids = [rng.integers(1, 48, size=t).astype(np.int64) for t in (12, 16)]
    n = len(ids)

    # large length_scale pushes the true mel length past the smallest
    # bucket, so the absurd ratio below cannot luck into a valid bucket
    enc_out, g = engine.encode_launch(ids, 12.0)
    y_lengths = np.asarray(enc_out[4])
    parts, b_rows = engine.synthesize_launch(
        enc_out, y_lengths, g, n, batch_index=0
    )
    ref = engine.crop_rows(engine.vocode_collect(parts, b_rows), y_lengths, n, 0.0)

    engine._frames_per_token = 1e-3  # absurdly low -> guaranteed mispredict
    before = engine._bucket_mispredicts
    enc_out2, g2 = engine.encode_launch(ids, 12.0)
    parts2, b_rows2, y2 = engine.synthesize_launch_predicted(
        enc_out2, g2, n, max_id_len=max(len(s) for s in ids),
        batch_index=0,
    )
    assert engine._bucket_mispredicts == before + 1
    got = engine.crop_rows(engine.vocode_collect(parts2, b_rows2), y2, n, 0.0)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)  # fallback = the exact bucket


def test_predicted_bucket_skipped_for_seeded_requests(engine):
    """An explicit seed promises bit reproducibility; the predicted
    bucket may differ run-to-run (estimator state), which changes the
    decode noise SHAPE and thus the draw — so seeded requests must take
    the exact-bucket path."""
    rng = np.random.default_rng(7)
    ids = [rng.integers(1, 48, size=12).astype(np.int64)]

    engine._frames_per_token = 50.0  # would predict a huge bucket
    enc_out, g = engine.encode_launch(ids, 1.0)
    parts, b_rows, y = engine.synthesize_launch_predicted(
        enc_out, g, 1, max_id_len=12, seed=11, batch_index=0
    )
    got = engine.crop_rows(engine.vocode_collect(parts, b_rows), y, 1, 0.0)

    enc_out2, g2 = engine.encode_launch(ids, 1.0)
    y2 = np.asarray(enc_out2[4])
    parts2, b2 = engine.synthesize_launch(
        enc_out2, y2, g2, 1, seed=11, batch_index=0
    )
    ref = engine.crop_rows(engine.vocode_collect(parts2, b2), y2, 1, 0.0)
    np.testing.assert_array_equal(got[0], ref[0])


def test_predicted_bucket_length_scale_normalized(engine):
    """The frames-per-token estimator is per token at length_scale 1.0:
    an ls=2 request must neither poison the ratio for later ls=1 traffic
    nor mispredict when the ratio was learned at ls=1."""
    rng = np.random.default_rng(8)
    ids = [rng.integers(1, 48, size=t).astype(np.int64) for t in (12, 16)]
    n = len(ids)
    max_len = max(len(s) for s in ids)

    # learn the ratio at ls=1
    engine._frames_per_token = 0.0
    enc_out, g = engine.encode_launch(ids, 1.0)
    y1 = np.asarray(enc_out[4])
    parts, b_rows, _ = engine.synthesize_launch_predicted(
        enc_out, g, n, max_id_len=max_len, length_scale=1.0, batch_index=0
    )
    engine.vocode_collect(parts, b_rows)
    ratio_ls1 = engine._frames_per_token
    assert ratio_ls1 > 0.0

    # an ls=3 request: prediction scales UP by ls (no mispredict), and
    # the observation divides ls back out (ratio unchanged, not 3x)
    before = engine._bucket_mispredicts
    enc_out2, g2 = engine.encode_launch(ids, 3.0)
    parts2, b2, y2 = engine.synthesize_launch_predicted(
        enc_out2, g2, n, max_id_len=max_len, length_scale=3.0, batch_index=0
    )
    engine.vocode_collect(parts2, b2)
    assert engine._bucket_mispredicts == before
    assert np.all(y2 >= y1)  # ls did lengthen the mels
    assert engine._frames_per_token == pytest.approx(ratio_ls1, rel=0.15)

    # and a following ls=1 request still predicts the tight bucket
    enc_out3, g3 = engine.encode_launch(ids, 1.0)
    parts3, b3, y3 = engine.synthesize_launch_predicted(
        enc_out3, g3, n, max_id_len=max_len, length_scale=1.0, batch_index=0
    )
    engine.vocode_collect(parts3, b3)
    assert engine._bucket_mispredicts == before
    np.testing.assert_array_equal(y3, y1)


def test_ragged_group_plan_ramps_first_group(engine, monkeypatch):
    """Multi-group plans start with a 1-row group: the large-batch wall
    clock is gated by when the first audio D2H can start (the tunnel link
    moves ~50 MB/s while compute finishes well before the transfer), so
    the longest row's transfer should begin after a single-row compute.
    Single-group plans are untouched (no extra dispatches for small work),
    and every emitted (rows, bucket) shape stays power-of-two."""
    import larynx_tpu.runtime.engine as engine_module

    plan_fn = engine_module.SynthesisEngine._ragged_group_plan

    # 8 uniform long rows, cap fits 3 -> ramp 1 then 2s (was 2,2,2,2)
    lens = np.full(8, 4900, dtype=np.int64)
    plan = plan_fn(engine, lens, 8, 5120, 16384)
    assert plan[0][1] == 1
    assert sum(g for _, g, _ in plan) == 8
    assert all(g & (g - 1) == 0 for _, g, _ in plan)  # powers of two
    starts = [s for s, _, _ in plan]
    assert starts == sorted(starts) and starts[0] == 0

    # single group: no ramp, one dispatch
    lens_small = np.full(8, 2000, dtype=np.int64)
    assert plan_fn(engine, lens_small, 8, 2048, 16384) == [(0, 8, 2048)]

    # one row: trivially one group
    assert plan_fn(engine, np.array([4900]), 1, 5120, 16384) == [(0, 1, 5120)]

    # opt-out restores the unramped plan
    monkeypatch.setenv("LARYNX_TPU_RAMP_FIRST_GROUP", "0")
    engine_module.ramp_first_group.cache_clear()
    try:
        plan_off = plan_fn(engine, lens, 8, 5120, 16384)
        assert plan_off[0][1] > 1
        assert sum(g for _, g, _ in plan_off) == 8
    finally:
        monkeypatch.delenv("LARYNX_TPU_RAMP_FIRST_GROUP")
        engine_module.ramp_first_group.cache_clear()


def test_ragged_group_plan_small_transfer_skips_ramp(engine, monkeypatch):
    """A small-batch plan (a few MB of audio) must NOT pay ramp dispatches:
    each extra group costs a ~24 ms tunnel round trip while the whole
    transfer is <100 ms — the round-4 SSML profile showed a 6-row voice
    unit fragmented into 4 vocode parts by the ramp.  The byte gate keeps
    the ramp for link-bound batches only."""
    import larynx_tpu.runtime.engine as engine_module

    plan_fn = engine_module.SynthesisEngine._ragged_group_plan

    # 6 rows, 1536/768 buckets ~= the SSML profile unit: ~3 MB of int16
    # at x256 upsample -> below the 8 MB default gate -> ONE dispatch at
    # the longest row's bucket (no ramp, no width splits: each avoided
    # group is a ~24 ms tunnel round trip, more than the padding costs)
    lens = np.array([1500, 1400, 700, 650, 600, 550], dtype=np.int64)
    plan = plan_fn(engine, lens, 6, 2048, 16384)
    est_bytes = 2 * engine.upsample * sum(
        engine.policy.mel_bucket(int(x)) for x in lens
    )
    assert est_bytes < engine_module.ramp_min_bytes()
    assert plan == [(0, 6, engine.policy.mel_bucket(1500))]

    # a small batch whose area exceeds the cap still splits (HBM bound)
    plan_big = plan_fn(engine, lens, 6, 2048, 4096)
    assert len(plan_big) > 1
    assert sum(g for _, g, _ in plan_big) == 6

    # forcing the gate to zero restores the ramped width-split plan
    monkeypatch.setenv("LARYNX_TPU_RAMP_MIN_BYTES", "0")
    engine_module.ramp_min_bytes.cache_clear()
    try:
        plan_forced = plan_fn(engine, lens, 6, 2048, 16384)
        assert plan_forced[0][1] == 1
        assert sum(g for _, g, _ in plan_forced) == 6
        assert all(g & (g - 1) == 0 for _, g, _ in plan_forced)
    finally:
        monkeypatch.delenv("LARYNX_TPU_RAMP_MIN_BYTES")
        engine_module.ramp_min_bytes.cache_clear()


def test_fused_encode_decode_matches_two_step(engine, monkeypatch):
    """encode_decode_launch_predicted (ONE dispatch for encode + flow
    decode at the predicted bucket) must match the two-step predicted
    path bit-for-bit: encode is deterministic and the decode key/bucket
    are constructed identically (VERDICT round-4 item 8; kept as an
    opt-in path after the A/B showed two-step pipelining wins — see
    fused_encode_enabled)."""
    import larynx_tpu.runtime.engine as engine_mod

    monkeypatch.setenv("LARYNX_TPU_FUSED_ENCODE", "1")
    engine_mod.fused_encode_enabled.cache_clear()
    rng = np.random.default_rng(7)
    ids = [rng.integers(1, 48, size=t).astype(np.int64) for t in (12, 16)]
    n = len(ids)

    # warm the estimator via the two-step path
    engine._frames_per_token = 0.0
    ref = engine.synthesize_batch(ids, batch_index=0)
    assert engine._frames_per_token > 0.0

    # two-step predicted reference
    enc_out, g = engine.encode_launch(ids, 1.0)
    parts, b_rows, y_ref = engine.synthesize_launch_predicted(
        enc_out, g, n, max_id_len=max(len(s) for s in ids), batch_index=0,
    )
    ref = engine.crop_rows(
        engine.vocode_collect(parts, b_rows), y_ref, n, 0.0
    )

    # fused path
    fused = engine.encode_decode_launch_predicted(ids, 1.0, batch_index=0)
    assert fused is not None
    mel, z_mask, key, y_got, _g = fused
    parts2 = engine.vocode_launch(mel, z_mask, n, 0.0, key, y_lengths=y_got)
    got = engine.crop_rows(
        engine.vocode_collect(parts2, mel.shape[0]), y_got, n, 0.0
    )

    np.testing.assert_array_equal(y_got, y_ref)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_fused_encode_decode_mispredict_falls_back(engine, monkeypatch):
    """A mispredicted bucket redispatches only the decode (the fused
    program also returns the encoder outputs) and still produces the
    classic path's audio."""
    import larynx_tpu.runtime.engine as engine_mod

    monkeypatch.setenv("LARYNX_TPU_FUSED_ENCODE", "1")
    engine_mod.fused_encode_enabled.cache_clear()
    rng = np.random.default_rng(8)
    ids = [rng.integers(1, 48, size=t).astype(np.int64) for t in (12, 16)]
    n = len(ids)

    enc_out, g = engine.encode_launch(ids, 12.0)
    y_lengths = np.asarray(enc_out[4])
    parts, b_rows = engine.synthesize_launch(
        enc_out, y_lengths, g, n, batch_index=0
    )
    ref = engine.crop_rows(
        engine.vocode_collect(parts, b_rows), y_lengths, n, 0.0
    )

    engine._frames_per_token = 1e-3  # guaranteed mispredict
    before = engine._bucket_mispredicts
    fused = engine.encode_decode_launch_predicted(ids, 12.0, batch_index=0)
    assert fused is not None
    assert engine._bucket_mispredicts == before + 1
    mel, z_mask, key, y_got, _g = fused
    parts2 = engine.vocode_launch(mel, z_mask, n, 0.0, key, y_lengths=y_got)
    got = engine.crop_rows(
        engine.vocode_collect(parts2, mel.shape[0]), y_got, n, 0.0
    )
    np.testing.assert_array_equal(y_got, y_lengths)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_fused_encode_decode_gates(engine, monkeypatch):
    """The fused path is off by default (negative A/B result), declines
    on a cold estimator even when enabled, and seeded batches never
    reach it (synthesize_batch routes them to the exact-bucket path)."""
    import larynx_tpu.runtime.engine as engine_mod

    rng = np.random.default_rng(9)
    ids = [rng.integers(1, 48, size=12).astype(np.int64)]

    engine._frames_per_token = 10.0
    engine_mod.fused_encode_enabled.cache_clear()
    assert not engine_mod.fused_encode_enabled()  # default off
    assert engine.encode_decode_launch_predicted(ids) is None

    monkeypatch.setenv("LARYNX_TPU_FUSED_ENCODE", "1")
    engine_mod.fused_encode_enabled.cache_clear()
    engine._frames_per_token = 0.0  # cold estimator still declines
    assert engine.encode_decode_launch_predicted(ids) is None
    monkeypatch.delenv("LARYNX_TPU_FUSED_ENCODE")
    engine_mod.fused_encode_enabled.cache_clear()
