"""Tacotron2 in JAX, channels-last, TPU-first.

Architecture follows the NVIDIA/tacotron2 reference the vestigial
``TextToSpeechType.TACOTRON2`` enum points at (larynx/constants.py:22):
character/phoneme embedding -> 3 conv+batchnorm layers -> BiLSTM encoder;
autoregressive decoder with location-sensitive attention (two LSTM cells,
prenet, gate/stop token); 5-layer conv postnet residual.

TPU-native design notes (NOT a torch translation):
  * activations are [batch, time, channels]; convs lower to MXU matmuls
    via the shared ``nn.conv1d`` (dimension_numbers NHC/HIO)
  * LSTM cells are fused single-matmul gates ([C_in,4H] @ + [H,4H] @,
    torch gate order i,f,g,o so checkpoints import as a transpose)
  * the sequential decode is ONE ``lax.scan`` program over a static step
    count (bucketed by the caller) — no per-step host dispatch; stop
    tokens flip a ``finished`` mask inside the scan and the true length
    comes back as an array (no data-dependent shapes under jit)
  * attention masking uses additive -1e9 on padded memory positions so
    one compiled program serves the whole ragged batch
  * the NVIDIA quirk of prenet dropout staying active at inference is
    kept (deterministic per-step keys via ``fold_in``), since it is the
    model's only stochasticity; set ``p_prenet_dropout=0`` for
    reproducible output

Inherently sequential: one decoder step per mel frame.  This family is
provided for checkpoint compatibility/completeness; GlowTTS remains the
throughput flagship (parallel decode).
"""

import math
import typing

import jax
import jax.numpy as jnp

from larynx_tpu.models.nn import conv1d
from larynx_tpu.models.tacotron2.config import Tacotron2Config

Params = typing.Dict[str, typing.Any]

_MASK_VALUE = -1e9


# -----------------------------------------------------------------------------
# Initialization


def _xavier(key, shape, fan_in, fan_out):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _linear_init(key, c_in, c_out, bias=True, gain=1.0):
    kw, kb = jax.random.split(key)
    p = {"w": gain * _xavier(kw, (c_in, c_out), c_in, c_out)}
    if bias:
        bound = 1.0 / math.sqrt(c_in)
        p["b"] = jax.random.uniform(kb, (c_out,), minval=-bound, maxval=bound)
    return p


def _conv_bn_init(key, k, c_in, c_out):
    kw, kb = jax.random.split(key)
    bound = math.sqrt(6.0 / (k * (c_in + c_out)))  # xavier over the taps
    return {
        "w": jax.random.uniform(
            kw, (k, c_in, c_out), minval=-bound, maxval=bound
        ),
        "b": jnp.zeros((c_out,)),
        "bn": {
            "gamma": jnp.ones((c_out,)),
            "beta": jnp.zeros((c_out,)),
            "mean": jnp.zeros((c_out,)),
            "var": jnp.ones((c_out,)),
        },
    }


def _lstm_init(key, c_in, hidden):
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / math.sqrt(hidden)

    def u(k, shape):
        return jax.random.uniform(k, shape, minval=-bound, maxval=bound)

    # fused torch-order gates (i, f, g, o); b = bias_ih + bias_hh
    return {
        "w_ih": u(k1, (c_in, 4 * hidden)),
        "w_hh": u(k2, (hidden, 4 * hidden)),
        "b": u(k3, (4 * hidden,)),
    }


def init_params(key: jax.Array, cfg: Tacotron2Config) -> Params:
    keys = iter(jax.random.split(key, 64))
    e = cfg.encoder_embedding_dim

    encoder_convs = [
        _conv_bn_init(next(keys), cfg.encoder_kernel_size, e, e)
        for _ in range(cfg.encoder_n_convolutions)
    ]
    post_convs = []
    for i in range(cfg.postnet_n_convolutions):
        c_in = cfg.mel_channels if i == 0 else cfg.postnet_embedding_dim
        c_out = (
            cfg.mel_channels
            if i == cfg.postnet_n_convolutions - 1
            else cfg.postnet_embedding_dim
        )
        post_convs.append(
            _conv_bn_init(next(keys), cfg.postnet_kernel_size, c_in, c_out)
        )

    att_in = cfg.prenet_dim + e
    dec_in = cfg.attention_rnn_dim + e
    proj_in = cfg.decoder_rnn_dim + e
    std = math.sqrt(2.0 / (cfg.num_symbols + cfg.symbols_embedding_dim))
    return {
        "embedding": jax.random.uniform(
            next(keys),
            (cfg.num_symbols, cfg.symbols_embedding_dim),
            minval=-math.sqrt(3.0) * std,
            maxval=math.sqrt(3.0) * std,
        ),
        "encoder": {
            "convs": encoder_convs,
            "lstm_fw": _lstm_init(next(keys), e, cfg.encoder_lstm_dim),
            "lstm_bw": _lstm_init(next(keys), e, cfg.encoder_lstm_dim),
        },
        "decoder": {
            "prenet": [
                _linear_init(
                    next(keys), cfg.mel_channels, cfg.prenet_dim, bias=False
                ),
                _linear_init(
                    next(keys), cfg.prenet_dim, cfg.prenet_dim, bias=False
                ),
            ],
            "attention_rnn": _lstm_init(next(keys), att_in, cfg.attention_rnn_dim),
            "attention": {
                "query": _linear_init(
                    next(keys),
                    cfg.attention_rnn_dim,
                    cfg.attention_dim,
                    bias=False,
                ),
                "memory": _linear_init(
                    next(keys), e, cfg.attention_dim, bias=False
                ),
                "v": _linear_init(
                    next(keys), cfg.attention_dim, 1, bias=False
                ),
                "location_conv": jax.random.uniform(
                    next(keys),
                    (
                        cfg.attention_location_kernel_size,
                        2,
                        cfg.attention_location_n_filters,
                    ),
                    minval=-math.sqrt(
                        6.0 / (cfg.attention_location_kernel_size * 2 + 2)
                    ),
                    maxval=math.sqrt(
                        6.0 / (cfg.attention_location_kernel_size * 2 + 2)
                    ),
                ),
                "location_dense": _linear_init(
                    next(keys),
                    cfg.attention_location_n_filters,
                    cfg.attention_dim,
                    bias=False,
                ),
            },
            "decoder_rnn": _lstm_init(next(keys), dec_in, cfg.decoder_rnn_dim),
            "projection": _linear_init(
                next(keys), proj_in, cfg.mel_channels
            ),
            "gate": _linear_init(next(keys), proj_in, 1),
        },
        "postnet": {"convs": post_convs},
    }


# -----------------------------------------------------------------------------
# Primitives


def lstm_cell(p: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """Fused LSTM cell, torch gate order (i, f, g, o)."""
    gates = x @ p["w_ih"] + h @ p["w_hh"] + p["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _lstm_scan(
    p: Params,
    x: jnp.ndarray,
    reverse: bool = False,
    mask: typing.Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run an LSTM over time.  x: [B, T, C] -> h sequence [B, T, H].

    With ``mask`` [B, T], padded steps carry state through unchanged —
    the functional equivalent of torch's ``pack_padded_sequence`` (the
    backward pass of a BiLSTM must START at the last valid frame, not
    evolve through bias-driven updates over padding).
    """
    bsz = x.shape[0]
    hidden = p["w_hh"].shape[0]
    h0 = jnp.zeros((bsz, hidden), x.dtype)

    def step(carry, inputs):
        h, c = carry
        if mask is None:
            xt = inputs
            h, c = lstm_cell(p, xt, h, c)
        else:
            xt, mt = inputs
            h_new, c_new = lstm_cell(p, xt, h, c)
            keep = mt[:, None]
            h = jnp.where(keep > 0, h_new, h)
            c = jnp.where(keep > 0, c_new, c)
        return (h, c), h

    xs = jnp.swapaxes(x, 0, 1)  # [T, B, C]
    if mask is not None:
        xs = (xs, jnp.swapaxes(mask, 0, 1))
    _, hs = jax.lax.scan(step, (h0, h0), xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def _bn(p: Params, x: jnp.ndarray, train: bool, eps: float = 1e-5):
    """BatchNorm over (B, T); running stats at inference, batch stats in
    training.  Returns (y, batch_stats or None)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1))
        var = jnp.var(x, axis=(0, 1))
    else:
        mean, var = p["mean"], p["var"]
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]
    return y, ((mean, var) if train else None)


# -----------------------------------------------------------------------------
# Encoder


def encode(
    params: Params,
    cfg: Tacotron2Config,
    ids: jnp.ndarray,
    lengths: typing.Optional[jnp.ndarray] = None,
    train: bool = False,
    dropout_key: typing.Optional[jax.Array] = None,
):
    """ids [B, T] -> (memory [B, T, E], mask [B, T] float {0,1}).

    Padded positions are zeroed between stages and excluded from
    attention by the mask; the BiLSTM carries state through padded
    steps unchanged (the functional equivalent of torch's packed
    sequences), so a padded row matches the same row run alone.
    """
    bsz, t = ids.shape
    if lengths is None:
        lengths = jnp.full((bsz,), t, dtype=jnp.int32)
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)

    x = params["embedding"][ids]  # [B, T, E]
    for i, conv in enumerate(params["encoder"]["convs"]):
        x = conv1d(x * mask[..., None], conv["w"], conv["b"])
        x, _ = _bn(conv["bn"], x, train=train)
        x = jax.nn.relu(x)
        if train and dropout_key is not None:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_key, i), 0.5, x.shape
            )
            x = jnp.where(keep, x / 0.5, 0.0)
    x = x * mask[..., None]
    fw = _lstm_scan(params["encoder"]["lstm_fw"], x, mask=mask)
    bw = _lstm_scan(params["encoder"]["lstm_bw"], x, reverse=True, mask=mask)
    memory = jnp.concatenate([fw, bw], axis=-1) * mask[..., None]
    return memory, mask


# -----------------------------------------------------------------------------
# Decoder


def _prenet(p, x, key, p_dropout: float):
    """Two ReLU linears with always-on dropout (the NVIDIA quirk)."""
    for i, layer in enumerate(p):
        x = jax.nn.relu(x @ layer["w"])
        if p_dropout > 0.0 and key is not None:
            keep = jax.random.bernoulli(
                jax.random.fold_in(key, i), 1.0 - p_dropout, x.shape
            )
            x = jnp.where(keep, x / (1.0 - p_dropout), 0.0)
    return x


def _attention(att: Params, query, memory, processed_memory, attn_cat, mask):
    """Location-sensitive attention.

    query [B, A_rnn]; attn_cat [B, T, 2] (current + cumulative weights).
    Returns (context [B, E], weights [B, T]).
    """
    loc = conv1d(attn_cat, att["location_conv"], padding=None)
    processed = (
        (query @ att["query"]["w"])[:, None, :]
        + loc @ att["location_dense"]["w"]
        + processed_memory
    )
    energies = jnp.squeeze(jnp.tanh(processed) @ att["v"]["w"], -1)  # [B, T]
    energies = jnp.where(mask > 0, energies, _MASK_VALUE)
    weights = jax.nn.softmax(energies, axis=-1)
    context = jnp.einsum("bt,bte->be", weights, memory)
    return context, weights


def _decoder_state0(cfg: Tacotron2Config, bsz: int, t: int, dtype):
    zeros = lambda *shape: jnp.zeros(shape, dtype)  # noqa: E731
    return {
        "attn_h": zeros(bsz, cfg.attention_rnn_dim),
        "attn_c": zeros(bsz, cfg.attention_rnn_dim),
        "dec_h": zeros(bsz, cfg.decoder_rnn_dim),
        "dec_c": zeros(bsz, cfg.decoder_rnn_dim),
        "attn_w": zeros(bsz, t),
        "attn_w_cum": zeros(bsz, t),
        "context": zeros(bsz, cfg.encoder_embedding_dim),
    }


def _decoder_step(
    params: Params,
    cfg: Tacotron2Config,
    state: dict,
    prenet_out: jnp.ndarray,
    memory: jnp.ndarray,
    processed_memory: jnp.ndarray,
    mask: jnp.ndarray,
):
    """One frame: returns (new_state, mel_frame [B, M], gate_logit [B])."""
    dec = params["decoder"]
    cell_in = jnp.concatenate([prenet_out, state["context"]], axis=-1)
    attn_h, attn_c = lstm_cell(
        dec["attention_rnn"], cell_in, state["attn_h"], state["attn_c"]
    )
    attn_cat = jnp.stack([state["attn_w"], state["attn_w_cum"]], axis=-1)
    context, weights = _attention(
        dec["attention"], attn_h, memory, processed_memory, attn_cat, mask
    )
    dec_in = jnp.concatenate([attn_h, context], axis=-1)
    dec_h, dec_c = lstm_cell(
        dec["decoder_rnn"], dec_in, state["dec_h"], state["dec_c"]
    )
    proj_in = jnp.concatenate([dec_h, context], axis=-1)
    mel = proj_in @ dec["projection"]["w"] + dec["projection"]["b"]
    gate = jnp.squeeze(proj_in @ dec["gate"]["w"] + dec["gate"]["b"], -1)
    new_state = {
        "attn_h": attn_h,
        "attn_c": attn_c,
        "dec_h": dec_h,
        "dec_c": dec_c,
        "attn_w": weights,
        "attn_w_cum": state["attn_w_cum"] + weights,
        "context": context,
    }
    return new_state, mel, gate


def decode_inference(
    params: Params,
    cfg: Tacotron2Config,
    memory: jnp.ndarray,
    mask: jnp.ndarray,
    max_steps: int,
    key: typing.Optional[jax.Array] = None,
):
    """Autoregressive decode as ONE scan over ``max_steps``.

    Returns (mels [B, S, M], gate_logits [B, S], lengths [B]) where
    ``lengths`` counts frames up to and including the stop-token frame
    (or ``max_steps`` if the gate never fired).  Frames after the stop
    are still computed (static shapes) — crop on the host.
    """
    dec = params["decoder"]
    bsz, t, _ = memory.shape
    processed_memory = memory @ dec["attention"]["memory"]["w"]
    state0 = _decoder_state0(cfg, bsz, t, memory.dtype)
    go = jnp.zeros((bsz, cfg.mel_channels), memory.dtype)
    finished0 = jnp.zeros((bsz,), bool)

    def step(carry, i):
        state, prev, finished, length = carry
        pkey = None if key is None else jax.random.fold_in(key, i)
        pre = _prenet(dec["prenet"], prev, pkey, cfg.p_prenet_dropout)
        state, mel, gate = _decoder_step(
            params, cfg, state, pre, memory, processed_memory, mask
        )
        stop = jax.nn.sigmoid(gate) > cfg.gate_threshold
        length = jnp.where(finished, length, i + 1)
        finished = finished | stop
        return (state, mel, finished, length), (mel, gate)

    (_, _, finished, lengths), (mels, gates) = jax.lax.scan(
        step,
        (state0, go, finished0, jnp.zeros((bsz,), jnp.int32)),
        jnp.arange(max_steps),
    )
    return (
        jnp.swapaxes(mels, 0, 1),
        jnp.swapaxes(gates, 0, 1),
        lengths,
    )


def decode_teacher(
    params: Params,
    cfg: Tacotron2Config,
    memory: jnp.ndarray,
    mask: jnp.ndarray,
    mel_targets: jnp.ndarray,
    key: typing.Optional[jax.Array] = None,
):
    """Teacher-forced decode for training.

    mel_targets [B, S, M]; inputs are the right-shifted targets (go
    frame first).  Returns (mels [B, S, M], gate_logits [B, S]).
    """
    dec = params["decoder"]
    bsz, t, _ = memory.shape
    processed_memory = memory @ dec["attention"]["memory"]["w"]
    state0 = _decoder_state0(cfg, bsz, t, memory.dtype)
    go = jnp.zeros((bsz, 1, cfg.mel_channels), mel_targets.dtype)
    inputs = jnp.concatenate([go, mel_targets[:, :-1]], axis=1)
    pre = _prenet(
        dec["prenet"], inputs, key, cfg.p_prenet_dropout
    )  # [B, S, P] — prenet has no cross-step state, one batched matmul

    def step(state, pre_t):
        state, mel, gate = _decoder_step(
            params, cfg, state, pre_t, memory, processed_memory, mask
        )
        return state, (mel, gate)

    _, (mels, gates) = jax.lax.scan(
        step, state0, jnp.swapaxes(pre, 0, 1)
    )
    return jnp.swapaxes(mels, 0, 1), jnp.swapaxes(gates, 0, 1)


# -----------------------------------------------------------------------------
# Postnet + top level


def postnet(params: Params, cfg: Tacotron2Config, mels: jnp.ndarray, train=False):
    """5-conv residual refiner: mels [B, S, M] -> residual [B, S, M]."""
    x = mels
    convs = params["postnet"]["convs"]
    for i, conv in enumerate(convs):
        x = conv1d(x, conv["w"], conv["b"])
        x, _ = _bn(conv["bn"], x, train=train)
        if i < len(convs) - 1:
            x = jnp.tanh(x)
    return x


def infer(
    params: Params,
    cfg: Tacotron2Config,
    ids: jnp.ndarray,
    lengths: typing.Optional[jnp.ndarray] = None,
    max_steps: typing.Optional[int] = None,
    key: typing.Optional[jax.Array] = None,
):
    """Full inference: ids [B, T] -> (mel_post [B, S, M], lengths [B]).

    ``max_steps`` must be static under jit (bucket it at the call site).
    """
    if max_steps is None:
        max_steps = cfg.max_decoder_steps
    memory, mask = encode(params, cfg, ids, lengths)
    mels, _, out_lengths = decode_inference(
        params, cfg, memory, mask, max_steps, key=key
    )
    mel_post = mels + postnet(params, cfg, mels)
    return mel_post, out_lengths


def forward_teacher(
    params: Params,
    cfg: Tacotron2Config,
    ids: jnp.ndarray,
    id_lengths: jnp.ndarray,
    mel_targets: jnp.ndarray,
    train: bool = True,
    key: typing.Optional[jax.Array] = None,
):
    """Training forward: returns (mel_pre, mel_post, gate_logits)."""
    enc_key = None if key is None else jax.random.fold_in(key, 0)
    dec_key = None if key is None else jax.random.fold_in(key, 1)
    memory, mask = encode(
        params, cfg, ids, id_lengths, train=train, dropout_key=enc_key
    )
    mels, gates = decode_teacher(
        params, cfg, memory, mask, mel_targets, key=dec_key
    )
    mel_post = mels + postnet(params, cfg, mels, train=train)
    return mels, mel_post, gates
