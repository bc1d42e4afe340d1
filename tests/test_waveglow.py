"""WaveGlow vocoder: invertibility, geometry, training loss, torch import,
end-to-end wrapper. The reference declares this vocoder type but has no
implementation (larynx/__init__.py:498-508), so there is no oracle — the
flow's own invertibility is the structural correctness anchor."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from larynx_tpu.models.waveglow import WaveGlowConfig, waveglow_config_from_json
from larynx_tpu.models.waveglow import model as wg

SMALL_CFG = WaveGlowConfig(
    mel_channels=8,
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


def _perturbed_params(key, cfg):
    """Random init with non-zero coupling end convs (zero-init couplings
    are identity, which would make invertibility trivially true)."""
    params = wg.init_params(key, cfg)
    for i, flow in enumerate(params["flows"]):
        k = jax.random.fold_in(key, 100 + i)
        flow["wn"]["end_w"] = (
            0.1 * jax.random.normal(k, flow["wn"]["end_w"].shape)
        )
    return params


def test_config_channel_accounting():
    cfg = waveglow_config_from_json(
        {
            "mel_channels": 80, "sampling_rate": 22050, "flows": 12,
            "groups": 8, "early_every": 4, "early_size": 2,
            "wn_kernel_size": 3, "wn_channels": 256, "wn_layers": 8,
        }
    )  # the shipped local/waveglow/wn_256/config.json contents
    assert [cfg.channels_at_flow(k) for k in (0, 3, 4, 7, 8, 11)] == [
        8, 8, 6, 6, 4, 4,
    ]
    assert cfg.n_remaining == 4


def test_forward_inverse_roundtrip():
    """infer(forward(audio)) must reconstruct the audio exactly — the
    defining property of the flow."""
    cfg = SMALL_CFG
    key = jax.random.PRNGKey(0)
    params = _perturbed_params(key, cfg)

    m = 6
    mel = jax.random.normal(jax.random.fold_in(key, 1), (2, m, cfg.mel_channels))
    audio = 0.5 * jax.random.normal(
        jax.random.fold_in(key, 2), (2, m * cfg.upsample_stride)
    )

    z, log_s_total, logdet_w = wg.forward(params, cfg, audio, mel)
    assert z.shape == (2, m * cfg.upsample_stride // cfg.groups, cfg.groups)
    assert np.isfinite(np.asarray(log_s_total)).all()
    assert np.isfinite(np.asarray(logdet_w)).all()

    recon = wg.infer(params, cfg, mel, z=z)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(audio), rtol=1e-4, atol=1e-4
    )


def test_loss_finite_with_grads():
    cfg = SMALL_CFG
    key = jax.random.PRNGKey(3)
    params = _perturbed_params(key, cfg)
    m = 4
    mel = jax.random.normal(jax.random.fold_in(key, 1), (1, m, cfg.mel_channels))
    audio = 0.3 * jax.random.normal(
        jax.random.fold_in(key, 2), (1, m * cfg.upsample_stride)
    )
    loss, grads = jax.value_and_grad(wg.loss_fn)(params, cfg, audio, mel)
    assert np.isfinite(float(loss))
    flat, _ = jax.tree.flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # end-conv gradients flow (couplings are learning)
    assert any(
        float(jnp.abs(f["wn"]["end_w"]).max()) > 0
        for f in grads["flows"]
    )


def test_logdet_matches_numerical_jacobian():
    """log_s_total + logdet_w_total must equal log|det d z/d audio| — a
    wrong sign or a dropped blocks-multiplier would keep every other test
    green while training maximizes the wrong objective."""
    cfg = WaveGlowConfig(
        mel_channels=2, flows=2, groups=4, early_every=2, early_size=2,
        wn_kernel_size=3, wn_channels=8, wn_layers=1,
        upsample_kernel=8, upsample_stride=4,
    )
    key = jax.random.PRNGKey(0)
    params = _perturbed_params(key, cfg)
    m = 2
    mel = jax.random.normal(jax.random.fold_in(key, 1), (1, m, cfg.mel_channels))
    audio = 0.5 * jax.random.normal(
        jax.random.fold_in(key, 2), (1, m * cfg.upsample_stride)
    )

    def flat_forward(a_flat):
        z, _, _ = wg.forward(params, cfg, a_flat.reshape(1, -1), mel)
        return z.reshape(-1)

    jac = jax.jacobian(flat_forward)(audio.reshape(-1))
    _sign, num_logdet = jnp.linalg.slogdet(jac)
    _z, log_s_total, logdet_w_total = wg.forward(params, cfg, audio, mel)
    np.testing.assert_allclose(
        float(num_logdet),
        float(log_s_total[0] + logdet_w_total[0]),
        rtol=1e-4, atol=1e-4,
    )


def test_mel_conditioning_changes_audio():
    """Different mels must produce different audio for the same prior
    noise (a dropped cond path would pass every shape/roundtrip test)."""
    cfg = SMALL_CFG
    key = jax.random.PRNGKey(2)
    params = _perturbed_params(key, cfg)
    m = 4
    blocks = m * cfg.upsample_stride // cfg.groups
    z = jax.random.normal(jax.random.fold_in(key, 1), (1, blocks, cfg.groups))
    mel_a = jax.random.normal(jax.random.fold_in(key, 2), (1, m, cfg.mel_channels))
    mel_b = mel_a + 1.0
    a = np.asarray(wg.infer(params, cfg, mel_a, z=z))
    b = np.asarray(wg.infer(params, cfg, mel_b, z=z))
    assert np.abs(a - b).max() > 1e-4


def test_infer_from_noise_shapes_and_finiteness():
    cfg = SMALL_CFG
    params = wg.init_params(jax.random.PRNGKey(1), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 5, cfg.mel_channels))
    audio = wg.infer(params, cfg, mel, key=jax.random.PRNGKey(3), sigma=0.9)
    assert audio.shape == (1, 5 * cfg.upsample_stride)
    assert np.isfinite(np.asarray(audio)).all()


def test_torch_import_roundtrip(tmp_path):
    """A synthetic NVIDIA-named state dict (weight-norm pairs, fused cond
    layer, convinv convs) imports into a params tree whose flow is still
    exactly invertible (verifies every mapped weight participates)."""
    torch = pytest.importorskip("torch")

    from larynx_tpu.convert.torch_import import (
        load_torch_state_dict,
        waveglow_params_from_state_dict,
    )

    cfg = SMALL_CFG
    gen = torch.Generator().manual_seed(0)

    def t(*shape, scale=0.1):
        return scale * torch.randn(*shape, generator=gen)

    sd = {
        "upsample.weight": t(cfg.mel_channels, cfg.mel_channels,
                             cfg.upsample_kernel),
        "upsample.bias": t(cfg.mel_channels),
    }
    ch = cfg.wn_channels
    cond_in = cfg.mel_channels * cfg.groups
    for k in range(cfg.flows):
        c = cfg.channels_at_flow(k)
        n_half = c // 2
        q, _ = torch.linalg.qr(torch.randn(c, c, generator=gen))
        sd[f"convinv.{k}.conv.weight"] = q[:, :, None]
        p = f"WN.{k}"
        sd[f"{p}.start.weight_v"] = t(ch, n_half, 1)
        sd[f"{p}.start.weight_g"] = torch.ones(ch, 1, 1)
        sd[f"{p}.start.bias"] = t(ch)
        sd[f"{p}.cond_layer.weight_v"] = t(2 * ch * cfg.wn_layers, cond_in, 1)
        sd[f"{p}.cond_layer.weight_g"] = torch.ones(2 * ch * cfg.wn_layers, 1, 1)
        sd[f"{p}.cond_layer.bias"] = t(2 * ch * cfg.wn_layers)
        for i in range(cfg.wn_layers):
            sd[f"{p}.in_layers.{i}.weight_v"] = t(2 * ch, ch, cfg.wn_kernel_size)
            sd[f"{p}.in_layers.{i}.weight_g"] = torch.ones(2 * ch, 1, 1)
            sd[f"{p}.in_layers.{i}.bias"] = t(2 * ch)
            rs = 2 * ch if i < cfg.wn_layers - 1 else ch
            sd[f"{p}.res_skip_layers.{i}.weight_v"] = t(rs, ch, 1)
            sd[f"{p}.res_skip_layers.{i}.weight_g"] = torch.ones(rs, 1, 1)
            sd[f"{p}.res_skip_layers.{i}.bias"] = t(rs)
        sd[f"{p}.end.weight"] = t(2 * n_half, ch, 1)
        sd[f"{p}.end.bias"] = t(2 * n_half)

    path = tmp_path / "generator.pth"
    torch.save({"model": sd}, path)

    sd_np = load_torch_state_dict(path, key="model")
    params = waveglow_params_from_state_dict(sd_np, cfg)

    # value-level check (a flow roundtrip inverts for ANY params, so it
    # cannot catch mapping/folding bugs): fold weight-norm by hand for
    # one dilated in_layer and compare against the imported tree
    v = sd["WN.1.in_layers.1.weight_v"].numpy()
    g = sd["WN.1.in_layers.1.weight_g"].numpy()
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    expect = np.transpose(v * (g / norm), (2, 1, 0))  # -> [k, C_in, C_out]
    np.testing.assert_allclose(
        np.asarray(params["flows"][1]["wn"]["in_w"][1]), expect, rtol=1e-6
    )
    # convinv inverse really is the inverse of the imported weight
    w = np.asarray(params["flows"][0]["convinv"]["w"])
    w_inv = np.asarray(params["flows"][0]["convinv"]["w_inv"])
    np.testing.assert_allclose(w @ w_inv, np.eye(w.shape[0]), atol=1e-5)

    m = 4
    mel = jax.random.normal(jax.random.PRNGKey(5), (1, m, cfg.mel_channels))
    audio = 0.4 * jax.random.normal(
        jax.random.PRNGKey(6), (1, m * cfg.upsample_stride)
    )
    z, _, _ = wg.forward(params, cfg, audio, mel)
    recon = wg.infer(params, cfg, mel, z=z)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(audio), rtol=1e-4, atol=1e-4
    )


def test_waveglow_engine_batched():
    """WaveGlow runs as the engine's batched vocode program (bucketed,
    per-row cropped), not just the per-sentence fallback wrapper."""
    from larynx_tpu.audio import AudioSettings
    from larynx_tpu.models.glow_tts import GlowTTSConfig
    from larynx_tpu.models.glow_tts.model import init_params as glow_init
    from larynx_tpu.runtime.engine import SynthesisEngine

    glow_cfg = GlowTTSConfig(
        hidden_channels=64, filter_channels=128, filter_channels_dp=64,
        n_layers_enc=2, n_blocks_dec=2, n_block_layers=2,
    )
    import dataclasses

    # engine mels are 80-channel; hop 256 keeps frame/sample math aligned
    cfg = dataclasses.replace(SMALL_CFG, mel_channels=80, upsample_stride=256,
                              upsample_kernel=512)
    eng = SynthesisEngine(
        glow_init(jax.random.PRNGKey(0), glow_cfg),
        glow_cfg,
        AudioSettings(signal_norm=True, max_norm=1.0, symmetric_norm=True,
                      clip_norm=True),
        vocoder_kind="waveglow",
        vocoder_params=wg.init_params(jax.random.PRNGKey(1), cfg),
        vocoder_cfg=cfg,
        seed=7,
    )
    rng = np.random.default_rng(0)
    ids = [rng.integers(1, 40, size=n).astype(np.int64) for n in (12, 8)]
    out = eng.synthesize_batch(ids, seed=3, length_scale=2.0)
    assert len(out) == 2
    for i, audio in enumerate(out):
        assert audio.dtype == np.int16
        assert audio.size % cfg.upsample_stride == 0 and audio.size > 0
        assert np.isfinite(audio.astype(np.float32)).all()
    # rows differ in length (ragged crop by predicted mel frames)
    assert out[0].size != out[1].size


def test_waveglow_engine_bf16_vocoder():
    """vocoder_half=True (the production default on TPU backends) must
    trace and run: the vocode program casts mel and noise to the vocoder
    dtype (regression: f32 activations hit bf16 conv weights)."""
    import dataclasses

    from larynx_tpu.audio import AudioSettings
    from larynx_tpu.models.glow_tts import GlowTTSConfig
    from larynx_tpu.models.glow_tts.model import init_params as glow_init
    from larynx_tpu.runtime.engine import SynthesisEngine

    glow_cfg = GlowTTSConfig(
        hidden_channels=64, filter_channels=128, filter_channels_dp=64,
        n_layers_enc=2, n_blocks_dec=2, n_block_layers=2,
    )
    cfg = dataclasses.replace(SMALL_CFG, mel_channels=80, upsample_stride=256,
                              upsample_kernel=512)
    eng = SynthesisEngine(
        glow_init(jax.random.PRNGKey(0), glow_cfg), glow_cfg,
        AudioSettings(signal_norm=True, max_norm=1.0, symmetric_norm=True,
                      clip_norm=True),
        vocoder_kind="waveglow",
        vocoder_params=wg.init_params(jax.random.PRNGKey(1), cfg),
        vocoder_cfg=cfg,
        vocoder_half=True,
        seed=7,
    )
    out = eng.synthesize_batch(
        [np.arange(1, 12, dtype=np.int64)], seed=3, length_scale=2.0
    )
    assert out[0].dtype == np.int16 and out[0].size > 0
    assert np.isfinite(out[0].astype(np.float32)).all()


def test_waveglow_engine_splits_rows_at_area_cap(monkeypatch):
    """Batches over the vocode-area cap vocode in row groups (the WN
    activations of the whole batch at once would blow HBM), with the
    final window clamped to the batch end."""
    import dataclasses

    import larynx_tpu.runtime.engine as engine_module
    from larynx_tpu.audio import AudioSettings
    from larynx_tpu.models.glow_tts import GlowTTSConfig
    from larynx_tpu.models.glow_tts.model import init_params as glow_init
    from larynx_tpu.runtime.engine import SynthesisEngine

    glow_cfg = GlowTTSConfig(
        hidden_channels=64, filter_channels=128, filter_channels_dp=64,
        n_layers_enc=2, n_blocks_dec=2, n_block_layers=2,
    )
    cfg = dataclasses.replace(SMALL_CFG, mel_channels=80, upsample_stride=256,
                              upsample_kernel=512)
    eng = SynthesisEngine(
        glow_init(jax.random.PRNGKey(0), glow_cfg), glow_cfg,
        AudioSettings(signal_norm=True, max_norm=1.0, symmetric_norm=True,
                      clip_norm=True),
        vocoder_kind="waveglow",
        # perturbed end convs: zero-init couplings are identities that
        # would make the grouping-invariance check vacuous
        vocoder_params=_perturbed_params(jax.random.PRNGKey(1), cfg),
        vocoder_cfg=cfg,
        seed=7,
    )
    rng = np.random.default_rng(1)
    ids = [
        rng.integers(1, 40, size=int(n)).astype(np.int64) for n in (10, 14, 7)
    ]
    enc_out, g = eng.encode_launch(ids, 2.0)
    y_lengths = np.asarray(enc_out[4])

    # unsplit reference first (huge cap -> one group)
    mel, z_mask, key = eng.decode_launch(enc_out, y_lengths, g, 3, seed=5)
    ref_parts = eng.vocode_launch(mel, z_mask, 3, 0.0, key, y_lengths=y_lengths)
    ref_rows = eng.crop_rows(
        eng.vocode_collect(ref_parts, mel.shape[0]), y_lengths, 3, 0.0
    )

    m = eng.policy.mel_bucket(int(y_lengths[:3].max()))
    monkeypatch.setattr(engine_module, "MAX_VOCODE_AREA", 4 * m)  # area=m
    parts = eng.vocode_launch(mel, z_mask, 3, 0.0, key, y_lengths=y_lengths)
    assert len(parts) > 1  # actually split
    # power-of-two group sizes (bounded compiled-shape set)
    for _, idxs in parts:
        assert len(idxs) & (len(idxs) - 1) == 0
    rows = eng.crop_rows(
        eng.vocode_collect(parts, mel.shape[0]), y_lengths, 3, 0.0
    )
    # the prior noise is drawn batch-wide and masked to valid blocks, so
    # a row's audio matches the unsplit run up to padded-tail edge
    # effects inside the WN receptive field
    for audio, ref in zip(rows, ref_rows):
        assert audio.dtype == np.int16 and audio.size == ref.size > 0
        a = audio.astype(np.float64)
        r = ref.astype(np.float64)
        corr = np.dot(a, r) / max(np.linalg.norm(a) * np.linalg.norm(r), 1e-9)
        assert corr > 0.999, corr


def test_waveglow_vocoder_end_to_end(tmp_path):
    """get_vocoder_model('waveglow') loads a native checkpoint from the
    reference's waveglow/<model> dir layout and vocodes mels to int16."""
    import dataclasses

    import larynx_tpu
    from larynx_tpu.convert.native import save_params

    cfg = dataclasses.replace(SMALL_CFG, mel_channels=80)
    model_dir = tmp_path / "waveglow" / "wn_256"
    model_dir.mkdir(parents=True)
    json.dump(
        {
            "mel_channels": 80, "sampling_rate": 22050,
            "flows": cfg.flows, "groups": cfg.groups,
            "early_every": cfg.early_every, "early_size": cfg.early_size,
            "wn_kernel_size": cfg.wn_kernel_size,
            "wn_channels": cfg.wn_channels, "wn_layers": cfg.wn_layers,
            "upsample_kernel": cfg.upsample_kernel,
            "upsample_stride": cfg.upsample_stride,
        },
        open(model_dir / "config.json", "w"),
    )
    save_params(
        model_dir / "generator.npz",
        wg.init_params(jax.random.PRNGKey(0), cfg),
    )

    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    voc = larynx_tpu.get_vocoder_model(
        "waveglow", custom_voices_dir=tmp_path, no_download=True
    )
    assert voc is not None
    mels = np.log(
        np.maximum(1e-5, np.random.default_rng(0).uniform(0, 2, (80, 20)))
    ).astype(np.float32)
    audio = voc.mels_to_audio(mels)
    assert audio.dtype == np.int16
    assert audio.shape == (20 * cfg.upsample_stride,)
    larynx_tpu._VOCODER_MODEL_CACHE.clear()


def test_waveglow_wrapper_chunks_long_utterance(monkeypatch, tmp_path):
    """A single very long utterance through the standalone wrapper must
    vocode in receptive-field-haloed time chunks (bounded WN footprint,
    mirroring the engine's area cap) and reproduce the unchunked program's
    interior samples over the SAME utterance-wide prior draw."""
    import dataclasses

    from larynx_tpu.constants import VocoderModelConfig
    from larynx_tpu.convert.native import save_params
    from larynx_tpu.waveglow import WaveGlowVocoder

    cfg = dataclasses.replace(SMALL_CFG, mel_channels=16)
    model_dir = tmp_path / "waveglow" / "wn_small"
    model_dir.mkdir(parents=True)
    json.dump(
        {
            "mel_channels": cfg.mel_channels, "sampling_rate": 22050,
            "flows": cfg.flows, "groups": cfg.groups,
            "early_every": cfg.early_every, "early_size": cfg.early_size,
            "wn_kernel_size": cfg.wn_kernel_size,
            "wn_channels": cfg.wn_channels, "wn_layers": cfg.wn_layers,
            "upsample_kernel": cfg.upsample_kernel,
            "upsample_stride": cfg.upsample_stride,
        },
        open(model_dir / "config.json", "w"),
    )
    save_params(
        model_dir / "generator.npz",
        _perturbed_params(jax.random.PRNGKey(0), cfg),
    )
    voc = WaveGlowVocoder(
        VocoderModelConfig(model_path=str(model_dir))
    )

    frames = 300
    cap = 96
    mels = np.log(
        np.maximum(
            1e-5,
            np.random.default_rng(0).uniform(0, 2, (1, cfg.mel_channels, frames)),
        )
    ).astype(np.float32)

    # shared utterance-wide prior, sized for both the chunk plan's widest
    # window and the unchunked full bucket
    bpf = cfg.upsample_stride // cfg.groups
    full_bucket = voc.policy.mel_bucket(frames)
    halo = voc._halo_frames()
    max_end = 0
    for start in range(0, frames, cap):
        lo = max(0, start - halo)
        hi = min(frames, start + cap + halo)
        max_end = max(max_end, lo + voc.policy.mel_bucket(hi - lo))
    n_blocks = max(max_end, full_bucket) * bpf
    z_full = voc.sigma * jax.random.normal(
        jax.random.PRNGKey(99), (1, n_blocks, cfg.groups)
    )

    chunked = voc._vocode_chunked(mels, cap, z_full=z_full)

    # unchunked oracle: same prior, full width
    pad = np.full(
        (1, cfg.mel_channels, full_bucket - frames), np.log(1e-5), np.float32
    )
    mel_full = np.concatenate([mels, pad], axis=-1)
    ref = np.asarray(
        voc._generate_z(
            voc.params,
            jnp.asarray(mel_full),
            z_full[:, : full_bucket * bpf],
        )
    )[:, : frames * cfg.upsample_stride]

    assert chunked.shape == ref.shape
    np.testing.assert_allclose(chunked, ref, rtol=1e-4, atol=1e-4)

    # and the public surface actually takes the chunked path under a tiny
    # engine cap, producing the right length with no seam blowups
    import larynx_tpu.runtime.engine as engine_module

    monkeypatch.setattr(engine_module, "MAX_VOCODE_AREA", 4 * cap)
    audio = voc.mels_to_audio(mels.squeeze(0))
    assert audio.dtype == np.int16
    assert audio.shape == (frames * cfg.upsample_stride,)
    assert np.isfinite(audio.astype(np.float32)).all()


def test_waveglow_wrapper_denoiser(tmp_path):
    """WaveGlow gets the same bias denoiser as HiFi-GAN (reference
    contract larynx/hifi_gan.py:171-203; NVIDIA ships the identical
    Denoiser for WaveGlow): zero mel + zero prior -> bias spectrum,
    spectral subtraction at synthesis, settings override honored."""
    import dataclasses

    import larynx_tpu
    from larynx_tpu.audio import audio_float_to_int16
    from larynx_tpu.models.hifi_gan import denoiser as hifi_denoiser

    from larynx_tpu.convert.native import save_params

    cfg = dataclasses.replace(SMALL_CFG, mel_channels=80)
    model_dir = tmp_path / "waveglow" / "wn_256"
    model_dir.mkdir(parents=True)
    json.dump(
        {
            "mel_channels": 80,
            "flows": cfg.flows, "groups": cfg.groups,
            "early_every": cfg.early_every, "early_size": cfg.early_size,
            "wn_channels": cfg.wn_channels, "wn_layers": cfg.wn_layers,
            "upsample_kernel": cfg.upsample_kernel,
            "upsample_stride": cfg.upsample_stride,
        },
        open(model_dir / "config.json", "w"),
    )
    save_params(
        model_dir / "generator.npz",
        wg.init_params(jax.random.PRNGKey(0), cfg),
    )
    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    voc = larynx_tpu.get_vocoder_model(
        "waveglow", custom_voices_dir=tmp_path, no_download=True
    )
    mels = np.log(
        np.maximum(1e-5, np.random.default_rng(0).uniform(0, 2, (80, 20)))
    ).astype(np.float32)

    plain = voc.mels_to_audio(mels, settings={"denoiser_strength": 0.0})
    denoised = voc.mels_to_audio(mels, settings={"denoiser_strength": 0.02})
    assert denoised.dtype == np.int16
    assert np.isfinite(denoised.astype(np.float32)).all()
    # the STFT round trip changes the waveform
    n = min(plain.size, denoised.size)
    assert not np.array_equal(plain[:n], denoised[:n])

    # bias spectrum is deterministic (zero prior): re-init matches
    bias_1 = np.asarray(voc.bias_spec)
    voc.bias_spec = None
    voc.maybe_init_denoiser()
    np.testing.assert_array_equal(bias_1, np.asarray(voc.bias_spec))

    # parity with manual spectral subtraction on the float audio
    voc._counter = iter([123])  # pin the prior draw
    float_audio = voc._vocode_bucketed(
        np.asarray(mels, dtype=np.float32)[None]
    )
    expect = audio_float_to_int16(
        np.asarray(
            hifi_denoiser.denoise(
                jnp.asarray(float_audio), voc.bias_spec, 0.02
            )
        ).squeeze(0)
    )
    voc._counter = iter([123])
    got = voc.mels_to_audio(mels, settings={"denoiser_strength": 0.02})
    np.testing.assert_array_equal(got, expect)
    larynx_tpu._VOCODER_MODEL_CACHE.clear()


def test_waveglow_engine_denoiser():
    """The engine's batched WaveGlow path honors denoiser_strength:
    bias init from zero mel + zero prior, spectral subtraction in the
    vocode program, STFT-rounded crop lengths."""
    import dataclasses

    from larynx_tpu.audio import AudioSettings
    from larynx_tpu.models.glow_tts import GlowTTSConfig
    from larynx_tpu.models.glow_tts.model import init_params as glow_init
    from larynx_tpu.runtime.engine import SynthesisEngine

    glow_cfg = GlowTTSConfig(
        hidden_channels=64, filter_channels=128, filter_channels_dp=64,
        n_layers_enc=2, n_blocks_dec=2, n_block_layers=2,
    )
    cfg = dataclasses.replace(SMALL_CFG, mel_channels=80, upsample_stride=256,
                              upsample_kernel=512)
    settings = AudioSettings(signal_norm=True, max_norm=1.0,
                             symmetric_norm=True, clip_norm=True)
    eng = SynthesisEngine(
        glow_init(jax.random.PRNGKey(0), glow_cfg), glow_cfg, settings,
        vocoder_kind="waveglow",
        vocoder_params=wg.init_params(jax.random.PRNGKey(1), cfg),
        vocoder_cfg=cfg,
        seed=7,
    )
    rng = np.random.default_rng(0)
    ids = [rng.integers(1, 40, size=n).astype(np.int64) for n in (12, 8)]
    plain = eng.synthesize_batch(ids, seed=3, length_scale=2.0)
    denoised = eng.synthesize_batch(
        ids, seed=3, length_scale=2.0, denoiser_strength=0.02
    )
    assert len(denoised) == 2
    for p, d in zip(plain, denoised):
        assert d.dtype == np.int16 and d.size > 0
        assert np.isfinite(d.astype(np.float32)).all()
        # denoised rows crop to nf*hop + fft (the STFT tail)
        fft = settings.filter_length
        hop = settings.hop_length
        nf = max(p.size - fft, 0)
        nf = -(-nf // hop)
        assert d.size == nf * hop + fft
        n = min(p.size, d.size)
        assert not np.array_equal(p[:n], d[:n])
