"""Tacotron2: torch-oracle parity, importer round trip, stop-token logic.

The reference declares the family (larynx/constants.py:22) but ships no
implementation, so — as with WaveGlow — there is no in-tree oracle to
import.  Instead the test builds a minimal NVIDIA-faithful torch model
(same module tree => same state-dict names the importer expects), pushes
identical weights through both stacks, and requires agreement.  That
anchors the math AND the checkpoint importer in one pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from larynx_tpu.convert.torch_import import tacotron2_params_from_state_dict
from larynx_tpu.models.tacotron2 import (
    Tacotron2Config,
    forward_teacher,
    infer,
    init_params,
)
from larynx_tpu.models.tacotron2.model import (
    _lstm_scan,
    decode_inference,
    encode,
    lstm_cell,
)

CFG = Tacotron2Config(
    num_symbols=40,
    symbols_embedding_dim=32,
    encoder_embedding_dim=32,
    encoder_kernel_size=5,
    encoder_n_convolutions=2,
    prenet_dim=16,
    attention_rnn_dim=48,
    decoder_rnn_dim=48,
    attention_dim=24,
    attention_location_n_filters=8,
    attention_location_kernel_size=15,
    postnet_embedding_dim=32,
    postnet_kernel_size=5,
    postnet_n_convolutions=3,
    mel_channels=12,
    max_decoder_steps=40,
    p_prenet_dropout=0.0,  # deterministic for parity
)


# -----------------------------------------------------------------------------
# Minimal NVIDIA-layout torch oracle (module tree == checkpoint names)


class _LinearNorm(nn.Module):
    def __init__(self, c_in, c_out, bias=True):
        super().__init__()
        self.linear_layer = nn.Linear(c_in, c_out, bias=bias)

    def forward(self, x):
        return self.linear_layer(x)


class _ConvNorm(nn.Module):
    def __init__(self, c_in, c_out, k, bias=True):
        super().__init__()
        self.conv = nn.Conv1d(c_in, c_out, k, padding=(k - 1) // 2, bias=bias)

    def forward(self, x):
        return self.conv(x)


class _LocationLayer(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.location_conv = _ConvNorm(
            2,
            cfg.attention_location_n_filters,
            cfg.attention_location_kernel_size,
            bias=False,
        )
        self.location_dense = _LinearNorm(
            cfg.attention_location_n_filters, cfg.attention_dim, bias=False
        )

    def forward(self, attention_weights_cat):
        return self.location_dense(
            self.location_conv(attention_weights_cat).transpose(1, 2)
        )


class _Attention(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.query_layer = _LinearNorm(
            cfg.attention_rnn_dim, cfg.attention_dim, bias=False
        )
        self.memory_layer = _LinearNorm(
            cfg.encoder_embedding_dim, cfg.attention_dim, bias=False
        )
        self.v = _LinearNorm(cfg.attention_dim, 1, bias=False)
        self.location_layer = _LocationLayer(cfg)

    def forward(self, query, memory, processed_memory, attention_weights_cat):
        processed = (
            self.query_layer(query.unsqueeze(1))
            + self.location_layer(attention_weights_cat)
            + processed_memory
        )
        energies = self.v(torch.tanh(processed)).squeeze(-1)
        weights = torch.softmax(energies, dim=1)
        context = torch.bmm(weights.unsqueeze(1), memory).squeeze(1)
        return context, weights


class _Prenet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.layers = nn.ModuleList(
            [
                _LinearNorm(cfg.mel_channels, cfg.prenet_dim, bias=False),
                _LinearNorm(cfg.prenet_dim, cfg.prenet_dim, bias=False),
            ]
        )

    def forward(self, x):
        for layer in self.layers:
            x = torch.relu(layer(x))  # parity mode: dropout p=0
        return x


class _Encoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        e = cfg.encoder_embedding_dim
        self.convolutions = nn.ModuleList(
            [
                nn.Sequential(
                    _ConvNorm(e, e, cfg.encoder_kernel_size), nn.BatchNorm1d(e)
                )
                for _ in range(cfg.encoder_n_convolutions)
            ]
        )
        self.lstm = nn.LSTM(e, e // 2, 1, batch_first=True, bidirectional=True)

    def forward(self, x):  # x: [B, E, T]
        for conv in self.convolutions:
            x = torch.relu(conv(x))
        x = x.transpose(1, 2)
        outputs, _ = self.lstm(x)
        return outputs  # [B, T, E]


class _Decoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        e = cfg.encoder_embedding_dim
        self.prenet = _Prenet(cfg)
        self.attention_rnn = nn.LSTMCell(
            cfg.prenet_dim + e, cfg.attention_rnn_dim
        )
        self.attention_layer = _Attention(cfg)
        self.decoder_rnn = nn.LSTMCell(
            cfg.attention_rnn_dim + e, cfg.decoder_rnn_dim
        )
        self.linear_projection = _LinearNorm(
            cfg.decoder_rnn_dim + e, cfg.mel_channels
        )
        self.gate_layer = _LinearNorm(cfg.decoder_rnn_dim + e, 1)

    def forward(self, memory, n_steps):
        cfg = self.cfg
        bsz, t, e = memory.shape
        processed_memory = self.attention_layer.memory_layer(memory)
        attn_h = memory.new_zeros(bsz, cfg.attention_rnn_dim)
        attn_c = memory.new_zeros(bsz, cfg.attention_rnn_dim)
        dec_h = memory.new_zeros(bsz, cfg.decoder_rnn_dim)
        dec_c = memory.new_zeros(bsz, cfg.decoder_rnn_dim)
        attn_w = memory.new_zeros(bsz, t)
        attn_w_cum = memory.new_zeros(bsz, t)
        context = memory.new_zeros(bsz, e)
        prev = memory.new_zeros(bsz, cfg.mel_channels)
        mels, gates = [], []
        for _ in range(n_steps):
            cell_in = torch.cat([self.prenet(prev), context], dim=-1)
            attn_h, attn_c = self.attention_rnn(cell_in, (attn_h, attn_c))
            cat = torch.stack([attn_w, attn_w_cum], dim=1)
            context, attn_w = self.attention_layer(
                attn_h, memory, processed_memory, cat
            )
            attn_w_cum = attn_w_cum + attn_w
            dec_h, dec_c = self.decoder_rnn(
                torch.cat([attn_h, context], dim=-1), (dec_h, dec_c)
            )
            proj_in = torch.cat([dec_h, context], dim=-1)
            mel = self.linear_projection(proj_in)
            gates.append(self.gate_layer(proj_in).squeeze(-1))
            mels.append(mel)
            prev = mel
        return torch.stack(mels, dim=1), torch.stack(gates, dim=1)


class _Postnet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        convs = []
        for i in range(cfg.postnet_n_convolutions):
            c_in = cfg.mel_channels if i == 0 else cfg.postnet_embedding_dim
            c_out = (
                cfg.mel_channels
                if i == cfg.postnet_n_convolutions - 1
                else cfg.postnet_embedding_dim
            )
            convs.append(
                nn.Sequential(
                    _ConvNorm(c_in, c_out, cfg.postnet_kernel_size),
                    nn.BatchNorm1d(c_out),
                )
            )
        self.convolutions = nn.ModuleList(convs)

    def forward(self, x):  # [B, M, S]
        for i, conv in enumerate(self.convolutions):
            x = conv(x)
            if i < len(self.convolutions) - 1:
                x = torch.tanh(x)
        return x


class _Tacotron2(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.embedding = nn.Embedding(cfg.num_symbols, cfg.symbols_embedding_dim)
        self.encoder = _Encoder(cfg)
        self.decoder = _Decoder(cfg)
        self.postnet = _Postnet(cfg)

    def forward(self, ids, n_steps):
        x = self.embedding(ids).transpose(1, 2)
        memory = self.encoder(x)
        mels, gates = self.decoder(memory, n_steps)
        post = mels + self.postnet(mels.transpose(1, 2)).transpose(1, 2)
        return memory, mels, post, gates


def _numpy_state_dict(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(7)
    model = _Tacotron2(CFG).eval()
    params = tacotron2_params_from_state_dict(_numpy_state_dict(model), CFG)
    return model, params


# -----------------------------------------------------------------------------


def test_lstm_cell_matches_torch():
    torch.manual_seed(0)
    cell = nn.LSTMCell(10, 14)
    p = {
        "w_ih": cell.weight_ih.detach().numpy().T,
        "w_hh": cell.weight_hh.detach().numpy().T,
        "b": (cell.bias_ih + cell.bias_hh).detach().numpy(),
    }
    x = torch.randn(3, 10)
    h = torch.randn(3, 14)
    c = torch.randn(3, 14)
    th, tc = cell(x, (h, c))
    jh, jc = lstm_cell(
        jax.tree.map(jnp.asarray, p),
        jnp.asarray(x.numpy()),
        jnp.asarray(h.numpy()),
        jnp.asarray(c.numpy()),
    )
    np.testing.assert_allclose(np.asarray(jh), th.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jc), tc.detach().numpy(), atol=1e-6)


def test_bilstm_matches_torch():
    torch.manual_seed(1)
    lstm = nn.LSTM(8, 6, 1, batch_first=True, bidirectional=True)
    sd = {k: v.detach().numpy() for k, v in lstm.state_dict().items()}
    fw = {
        "w_ih": sd["weight_ih_l0"].T,
        "w_hh": sd["weight_hh_l0"].T,
        "b": sd["bias_ih_l0"] + sd["bias_hh_l0"],
    }
    bw = {
        "w_ih": sd["weight_ih_l0_reverse"].T,
        "w_hh": sd["weight_hh_l0_reverse"].T,
        "b": sd["bias_ih_l0_reverse"] + sd["bias_hh_l0_reverse"],
    }
    x = torch.randn(2, 11, 8)
    want, _ = lstm(x)
    xj = jnp.asarray(x.numpy())
    got = jnp.concatenate(
        [
            _lstm_scan(jax.tree.map(jnp.asarray, fw), xj),
            _lstm_scan(jax.tree.map(jnp.asarray, bw), xj, reverse=True),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=1e-5
    )


def test_full_model_matches_torch_oracle(oracle):
    """Identical weights through both stacks: encoder memory, the full
    autoregressive decode, and the postnet refinement must agree."""
    model, params = oracle
    ids = torch.tensor([[3, 9, 1, 22, 17, 5, 30, 2]])
    n_steps = 25
    with torch.no_grad():
        t_memory, t_mels, t_post, t_gates = model(ids, n_steps)

    jids = jnp.asarray(ids.numpy())
    memory, mask = encode(params, CFG, jids)
    np.testing.assert_allclose(
        np.asarray(memory), t_memory.numpy(), atol=1e-5
    )
    mels, gates, _ = decode_inference(
        params, CFG, memory, mask, n_steps, key=None
    )
    np.testing.assert_allclose(np.asarray(mels), t_mels.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gates), t_gates.numpy(), atol=2e-4)
    from larynx_tpu.models.tacotron2 import postnet as jpostnet

    post = mels + jpostnet(params, CFG, mels)
    np.testing.assert_allclose(np.asarray(post), t_post.numpy(), atol=5e-4)


def test_gate_stop_sets_lengths(oracle):
    """Biasing the gate high stops every row at frame 1."""
    _, params = oracle
    eager = jax.tree.map(np.asarray, params)
    eager["decoder"]["gate"]["b"] = np.full_like(
        eager["decoder"]["gate"]["b"], 50.0
    )
    ids = jnp.asarray([[3, 9, 1, 22], [4, 8, 2, 0]])
    mel, lengths = infer(
        jax.tree.map(jnp.asarray, eager),
        CFG,
        ids,
        jnp.asarray([4, 3]),
        max_steps=10,
    )
    assert mel.shape == (2, 10, CFG.mel_channels)
    assert list(np.asarray(lengths)) == [1, 1]


def test_padded_batch_matches_single(oracle):
    """A padded batch row must produce the same mels as the row alone
    (attention masking makes padding invisible)."""
    _, params = oracle
    ids1 = jnp.asarray([[3, 9, 1, 22, 17]])
    ids2 = jnp.asarray([[3, 9, 1, 22, 17, 0, 0, 0], [5, 6, 7, 8, 9, 10, 11, 2]])
    lengths = jnp.asarray([5, 8])
    m1, _, _ = decode_inference(
        params, CFG, *encode(params, CFG, ids1), 12, key=None
    )
    memory, mask = encode(params, CFG, ids2, lengths)
    m2, _, _ = decode_inference(params, CFG, memory, mask, 12, key=None)
    np.testing.assert_allclose(
        np.asarray(m1[0]), np.asarray(m2[0]), atol=1e-4
    )


def test_prenet_dropout_is_live_at_inference(oracle):
    """The NVIDIA quirk: with p>0, two keys give two different outputs."""
    _, params = oracle
    import dataclasses

    cfg = dataclasses.replace(CFG, p_prenet_dropout=0.5)
    ids = jnp.asarray([[3, 9, 1, 22]])
    a, _ = infer(params, cfg, ids, max_steps=8, key=jax.random.PRNGKey(0))
    b, _ = infer(params, cfg, ids, max_steps=8, key=jax.random.PRNGKey(1))
    c, _ = infer(params, cfg, ids, max_steps=8, key=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(a), np.asarray(c))


def test_teacher_forced_shapes_and_grads(oracle):
    """Teacher-forced forward is differentiable end to end."""
    _, params = oracle
    ids = jnp.asarray([[3, 9, 1, 22, 17, 5], [4, 8, 2, 1, 0, 0]])
    id_lengths = jnp.asarray([6, 4])
    targets = jax.random.normal(jax.random.PRNGKey(3), (2, 15, CFG.mel_channels))

    def loss(p):
        pre, post, gates = forward_teacher(
            p, CFG, ids, id_lengths, targets, train=False
        )
        return (
            jnp.mean((pre - targets) ** 2)
            + jnp.mean((post - targets) ** 2)
            + jnp.mean(gates**2)
        )

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_random_init_infer_shapes():
    params = init_params(jax.random.PRNGKey(0), CFG)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 0, 0], [7, 8, 9, 1, 0, 0, 0, 0]])
    mel, lengths = infer(
        params, CFG, ids, jnp.asarray([6, 4]), max_steps=20,
        key=jax.random.PRNGKey(1),
    )
    assert mel.shape == (2, 20, CFG.mel_channels)
    assert np.all(np.isfinite(np.asarray(mel)))
    assert np.all(np.asarray(lengths) >= 1)


# -----------------------------------------------------------------------------
# End-to-end pipeline: a synthetic tacotron2 voice dir through
# text_to_speech (checkpoint resolution -> frontend -> mels -> vocoder)


def test_pipeline_end_to_end_tacotron2(tmp_path):
    import json

    import larynx_tpu
    from larynx_tpu.constants import VocoderQuality
    from larynx_tpu.convert.native import save_params
    from larynx_tpu.models.hifi_gan import (
        hifi_gan_config_from_json,
        init_params as hifi_init,
    )

    reference = __import__("pathlib").Path("/root/reference")
    phonemes_src = (
        reference / "local/en-us/harvard-glow_tts/phonemes.txt"
    ).read_text(encoding="utf-8")
    n_symbols = (
        max(
            int(line.split()[0])
            for line in phonemes_src.splitlines()
            if line.strip()
        )
        + 1
    )

    voice_config = {
        "audio": {
            "filter_length": 1024,
            "hop_length": 256,
            "win_length": 1024,
            "mel_channels": 12,
            "sample_rate": 22050,
            "mel_fmin": 0.0,
            "mel_fmax": 8000.0,
            "signal_norm": False,
            "do_dynamic_range_compression": False,
            "convert_db_to_amp": False,
        },
        "model": {
            "num_symbols": n_symbols,
            "symbols_embedding_dim": 32,
            "encoder_embedding_dim": 32,
            "encoder_n_convolutions": 2,
            "prenet_dim": 16,
            "attention_rnn_dim": 48,
            "decoder_rnn_dim": 48,
            "attention_dim": 24,
            "attention_location_n_filters": 8,
            "attention_location_kernel_size": 15,
            "postnet_embedding_dim": 32,
            "postnet_n_convolutions": 3,
            "mel_channels": 12,
            "max_decoder_steps": 60,
        },
    }
    vocoder_config = {
        "audio": {"num_mels": 12, "sampling_rate": 22050},
        "model": {
            "resblock": "2",
            "upsample_rates": [8, 8, 2, 2],
            "upsample_kernel_sizes": [16, 16, 4, 4],
            "upsample_initial_channel": 16,
            "resblock_kernel_sizes": [3, 5],
            "resblock_dilation_sizes": [[1, 2], [2, 6]],
        },
    }

    from larynx_tpu.models.tacotron2 import (
        tacotron2_config_from_voice_json,
    )

    voice_dir = tmp_path / "en-us" / "test_voice-tacotron2"
    voice_dir.mkdir(parents=True)
    (voice_dir / "config.json").write_text(json.dumps(voice_config))
    (voice_dir / "phonemes.txt").write_text(phonemes_src, encoding="utf-8")
    cfg = tacotron2_config_from_voice_json(voice_config)
    save_params(
        voice_dir / "generator.npz", init_params(jax.random.PRNGKey(0), cfg)
    )

    voc_dir = tmp_path / "hifi_gan" / "vctk_small"
    voc_dir.mkdir(parents=True)
    (voc_dir / "config.json").write_text(json.dumps(vocoder_config))
    save_params(
        voc_dir / "generator.npz",
        hifi_init(
            jax.random.PRNGKey(1), hifi_gan_config_from_json(vocoder_config)
        ),
    )

    larynx_tpu._TTS_MODEL_CACHE.clear()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    larynx_tpu._ENGINE_CACHE.clear()
    try:
        results = list(
            larynx_tpu.text_to_speech(
                "Hello world. A second sentence.",
                voice_or_lang="en-us_test_voice-tacotron2",
                vocoder_or_quality=VocoderQuality.LOW,
                custom_voices_dir=tmp_path,
                no_download=True,
            )
        )
    finally:
        larynx_tpu._TTS_MODEL_CACHE.clear()
        larynx_tpu._VOCODER_MODEL_CACHE.clear()
        larynx_tpu._ENGINE_CACHE.clear()

    assert len(results) == 2
    for res in results:
        assert res.audio is not None and res.audio.dtype == np.int16
        assert res.audio.size > 0
        assert res.sample_rate == 22050


# -----------------------------------------------------------------------------
# Training step


def _train_batch(rng, bsz=4, t=6, s=14):
    ids = rng.integers(1, CFG.num_symbols, size=(bsz, t))
    return {
        "ids": jnp.asarray(ids.astype(np.int32)),
        "id_lengths": jnp.asarray([t, t - 1, t - 2, t - 3], dtype=jnp.int32),
        "mels": jnp.asarray(
            rng.standard_normal((bsz, s, CFG.mel_channels)).astype(np.float32)
        ),
        "mel_lengths": jnp.asarray([s, s - 2, s - 4, s - 6], dtype=jnp.int32),
    }


def test_train_step_reduces_loss():
    import optax

    from larynx_tpu.models.tacotron2.training import (
        init_train_state,
        make_train_step,
    )

    opt = optax.adam(1e-3)
    state = init_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt)
    batch = _train_batch(np.random.default_rng(0))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_train_step_dp_mesh(monkeypatch):
    """DP-sharded teacher-forced step over the 8-device mesh matches the
    single-device step (params replicated, rows sharded)."""
    import optax

    from larynx_tpu.models.tacotron2.training import (
        init_train_state,
        make_train_step,
    )
    from larynx_tpu.parallel.mesh import serving_mesh

    monkeypatch.setenv("LARYNX_TPU_MESH", "on")
    mesh = serving_mesh()
    assert mesh is not None and mesh.shape["data"] == 8

    opt = optax.adam(1e-3)
    state = init_train_state(jax.random.PRNGKey(0), CFG, opt)
    step_sharded = make_train_step(CFG, opt, mesh=mesh)
    step_single = make_train_step(CFG, opt)

    rng = np.random.default_rng(1)
    batch = {
        "ids": jnp.asarray(
            rng.integers(1, CFG.num_symbols, size=(8, 6)).astype(np.int32)
        ),
        "id_lengths": jnp.asarray([6, 5, 4, 3, 6, 5, 4, 3], dtype=jnp.int32),
        "mels": jnp.asarray(
            rng.standard_normal((8, 12, CFG.mel_channels)).astype(np.float32)
        ),
        "mel_lengths": jnp.asarray(
            [12, 10, 8, 6, 12, 10, 8, 6], dtype=jnp.int32
        ),
    }
    key = jax.random.PRNGKey(2)
    _, m_sharded = step_sharded(state, batch, key)
    _, m_single = step_single(state, batch, key)
    for k in ("loss", "mel_pre", "mel_post", "gate"):
        assert np.isfinite(float(m_sharded[k])), k
        np.testing.assert_allclose(
            float(m_sharded[k]), float(m_single[k]), rtol=2e-4
        )
