"""WaveGlow vocoder: mel -> waveform via an audio-domain normalizing flow.

TPU-native (channels-last, MXU-matmul 1x1s) implementation of the NVIDIA
WaveGlow architecture whose config the reference ships at
local/waveglow/wn_256/config.json (declared at larynx/constants.py:31 but
never implemented there; see PAPERS.md "WaveGlow: A Flow-based Generative
Network for Speech Synthesis").

Structure (per the paper / NVIDIA geometry): audio samples fold into
``groups`` channels per time block; mels upsample (transposed conv) to
sample rate and fold the same way as conditioning.  Each of ``flows``
steps = invertible 1x1 conv over the current channels + an affine
coupling whose transform comes from a conditioned WaveNet (WN) stack.
Every ``early_every`` flows, ``early_size`` channels exit to the output
z (forward) / enter from the prior (inference).

The per-flow channel count shrinks (8 -> 6 -> 4 for wn_256), so flows are
a Python list of heterogeneous pytrees unrolled under jit, not a scan.
"""

import typing

import jax
import jax.numpy as jnp

from larynx_tpu.models.nn import (
    conv1d,
    conv_transpose1d,
    conv_transpose1d_phased,
    matmul1x1,
)

Params = typing.Dict[str, typing.Any]


# ---------------------------------------------------------------------------
# init


def _conv_init(key, k, c_in, c_out, scale=0.05):
    kw, kb = jax.random.split(key)
    return (
        jax.random.normal(kw, (k, c_in, c_out)) * scale,
        jax.random.normal(kb, (c_out,)) * 0.01,
    )


def init_params(key: jax.Array, cfg: "WaveGlowConfig") -> Params:
    from larynx_tpu.models.waveglow.config import WaveGlowConfig  # noqa: F401

    # per flow: qr + start + cond + (in + res_skip) per WN layer
    keys = iter(
        jax.random.split(key, 8 + cfg.flows * (4 + 2 * cfg.wn_layers))
    )
    up_w, up_b = _conv_init(
        next(keys), cfg.upsample_kernel, cfg.mel_channels, cfg.mel_channels
    )
    params: Params = {"upsample": {"w": up_w, "b": up_b}, "flows": []}

    ch = cfg.wn_channels
    cond_in = cfg.mel_channels * cfg.groups
    for k in range(cfg.flows):
        c = cfg.channels_at_flow(k)
        n_half = c // 2
        w = jnp.linalg.qr(jax.random.normal(next(keys), (c, c)))[0]
        w = jnp.where(jnp.linalg.det(w) < 0, w.at[:, 0].mul(-1), w)

        start_w, start_b = _conv_init(next(keys), 1, n_half, ch)
        cond_w, cond_b = _conv_init(
            next(keys), 1, cond_in, 2 * ch * cfg.wn_layers
        )
        in_w, in_b, rs_w, rs_b = [], [], [], []
        for i in range(cfg.wn_layers):
            wci, bci = _conv_init(next(keys), cfg.wn_kernel_size, ch, 2 * ch)
            in_w.append(wci)
            in_b.append(bci)
            rs_out = 2 * ch if i < cfg.wn_layers - 1 else ch
            wrs, brs = _conv_init(next(keys), 1, ch, rs_out)
            rs_w.append(wrs[0])
            rs_b.append(brs)
        params["flows"].append(
            {
                "convinv": {"w": w, "w_inv": jnp.linalg.inv(w)},
                "wn": {
                    "start_w": start_w[0],
                    "start_b": start_b,
                    "cond_w": cond_w[0],
                    "cond_b": cond_b,
                    "in_w": in_w,
                    "in_b": in_b,
                    "res_skip_w": rs_w,
                    "res_skip_b": rs_b,
                    # end conv zero-init: flows start as identity
                    "end_w": jnp.zeros((ch, 2 * n_half)),
                    "end_b": jnp.zeros((2 * n_half,)),
                },
            }
        )
    return params


# ---------------------------------------------------------------------------
# pieces


def _upsample_cond(params: Params, cfg, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, M, n_mels] -> grouped conditioning [B, blocks, n_mels*groups].

    NVIDIA semantics: ConvTranspose1d upsample, trim the (kernel - stride)
    tail so length == M * stride, then fold ``groups`` consecutive samples
    into channels with (mel_ch, offset) ordering.
    """
    up = params["upsample"]
    t = mel.shape[1] * cfg.upsample_stride
    if (
        cfg.upsample_kernel % cfg.upsample_stride == 0
        and cfg.upsample_kernel // cfg.upsample_stride <= 16
    ):
        # guard the tap count too: the phased path builds a
        # [B, T, (k/stride)*Ci] window stack, so a degenerate config
        # (stride=2, k=1024) would blow memory/compile time
        # phase-matmul path: the dilated-conv lowering of this k=1024 /
        # stride=256 transposed conv wastes ~256x the FLOPs (see
        # models/nn.py::conv_transpose1d_phased) — measured 52 ms -> sub-ms
        # at B=1, 128 mel frames on TPU v5e
        spect = conv_transpose1d_phased(
            mel, up["w"], up["b"], stride=cfg.upsample_stride
        )
    else:
        spect = conv_transpose1d(
            mel, up["w"], up["b"], stride=cfg.upsample_stride, padding=0
        )
        spect = spect[:, :t, :]  # [B, T, n_mels]
    b = spect.shape[0]
    blocks = t // cfg.groups
    # [B, blocks, groups, n_mels] -> [B, blocks, n_mels, groups] so the
    # flattened channel index is mel_ch * groups + offset (NVIDIA unfold)
    spect = spect.reshape(b, blocks, cfg.groups, cfg.mel_channels)
    spect = jnp.swapaxes(spect, 2, 3)
    return spect.reshape(b, blocks, cfg.mel_channels * cfg.groups)


def _wn(
    p: Params,
    cfg,
    x0: jnp.ndarray,
    spect_g: jnp.ndarray,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """Conditioned WaveNet stack -> coupling (b, log_s) channels.

    x0: [B, blocks, n_half]; spect_g: [B, blocks, n_mels*groups].  The
    fused cond 1x1 is applied PER LAYER (a [2ch]-wide slice of the weight
    at a time): same FLOPs as one big matmul, 1/wn_layers the live
    activation bytes — the hoisted [B, blocks, 2ch*layers] product was
    the peak-HBM buffer at wn_256 geometry.

    ``use_pallas`` runs each layer as ONE fused VMEM-resident kernel
    (ops/wn_layer.py) instead of four HLOs with HBM round trips between
    them; only the residual add / skip accumulation stay in XLA.
    """
    ch = p["in_w"][0].shape[2] // 2
    h = matmul1x1(x0, p["start_w"], p["start_b"])
    skip = None
    for i in range(cfg.wn_layers):
        cond_w = jax.lax.dynamic_slice_in_dim(
            p["cond_w"], i * 2 * ch, 2 * ch, axis=1
        )
        cond_b = jax.lax.dynamic_slice_in_dim(
            p["cond_b"], i * 2 * ch, 2 * ch, 0
        )
        if use_pallas:
            from larynx_tpu.ops.wn_layer import (
                default_tile,
                fused_wn_layer_state,
            )

            h, skip = fused_wn_layer_state(
                h, spect_g, skip, p["in_w"][i], p["in_b"][i],
                cond_w, cond_b, p["res_skip_w"][i], p["res_skip_b"][i],
                dilation=2**i,
                first=(i == 0),
                last=(i == cfg.wn_layers - 1),
                tile=default_tile(),
                interpret=pallas_interpret,
            )
        else:
            a = conv1d(h, p["in_w"][i], p["in_b"][i], dilation=2**i)
            a = a + matmul1x1(spect_g, cond_w, cond_b)
            acts = jnp.tanh(a[..., :ch]) * jax.nn.sigmoid(a[..., ch:])
            rs = matmul1x1(acts, p["res_skip_w"][i], p["res_skip_b"][i])
            if i < cfg.wn_layers - 1:
                h = h + rs[..., :ch]
                s = rs[..., ch:]
            else:
                s = rs
            skip = s if skip is None else skip + s
    return matmul1x1(skip, p["end_w"], p["end_b"])


def _group_audio(audio: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[B, T] -> [B, T//groups, groups] (consecutive samples as channels)."""
    b, t = audio.shape
    return audio[:, : (t // groups) * groups].reshape(b, t // groups, groups)


# ---------------------------------------------------------------------------
# forward (training direction): audio -> z, logdets


def forward(
    params: Params, cfg, audio: jnp.ndarray, mel: jnp.ndarray
) -> typing.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """audio [B, T] (T == M*upsample_stride), mel [B, M, n_mels]
    -> (z [B, blocks, groups], log_s_total [B], logdet_w_total [B])."""
    cond = _upsample_cond(params, cfg, mel)
    x = _group_audio(audio, cfg.groups)
    blocks = x.shape[1]
    outputs = []
    log_s_total = jnp.zeros((x.shape[0],), x.dtype)
    logdet_w_total = jnp.zeros((x.shape[0],), x.dtype)

    for k, flow in enumerate(params["flows"]):
        if k % cfg.early_every == 0 and k > 0:
            outputs.append(x[..., : cfg.early_size])
            x = x[..., cfg.early_size :]
        w = flow["convinv"]["w"]
        x = jnp.einsum("btc,dc->btd", x, w)
        _sign, logdet = jnp.linalg.slogdet(w)
        logdet_w_total = logdet_w_total + blocks * logdet

        n_half = x.shape[-1] // 2
        x0, x1 = x[..., :n_half], x[..., n_half:]
        out = _wn(flow["wn"], cfg, x0, cond)
        b_t, log_s = out[..., :n_half], out[..., n_half:]
        x1 = x1 * jnp.exp(log_s) + b_t
        log_s_total = log_s_total + jnp.sum(log_s, axis=(1, 2))
        x = jnp.concatenate([x0, x1], axis=-1)

    outputs.append(x)
    return jnp.concatenate(outputs, axis=-1), log_s_total, logdet_w_total


def loss_fn(params: Params, cfg, audio, mel, sigma: float = 1.0):
    """WaveGlow negative log-likelihood (paper eq. 6), per-element mean."""
    z, log_s_total, logdet_w_total = forward(params, cfg, audio, mel)
    n = z.size
    return (
        jnp.sum(z * z) / (2.0 * sigma * sigma)
        - jnp.sum(log_s_total)
        - jnp.sum(logdet_w_total)
    ) / n


# ---------------------------------------------------------------------------
# inference (reverse direction): z -> audio


def infer(
    params: Params,
    cfg,
    mel: jnp.ndarray,
    key: typing.Optional[jax.Array] = None,
    z: typing.Optional[jnp.ndarray] = None,
    sigma: float = 1.0,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """mel [B, M, n_mels] -> audio [B, M*upsample_stride].

    ``z`` ([B, blocks, groups], the forward output layout) makes inference
    deterministic (invertibility tests); otherwise noise is drawn from
    ``key`` and scaled by ``sigma``.
    """
    cond = _upsample_cond(params, cfg, mel)
    b = mel.shape[0]
    blocks = cond.shape[1]
    if z is None:
        z = sigma * jax.random.normal(
            key, (b, blocks, cfg.groups), mel.dtype
        )

    # the forward pass emits early chunks first and the residual tail
    # last: walk the same layout backwards
    early_flows = [
        k for k in range(cfg.flows) if k % cfg.early_every == 0 and k > 0
    ]
    offs = 0
    chunks = {}
    for k in early_flows:
        chunks[k] = z[..., offs : offs + cfg.early_size]
        offs += cfg.early_size
    x = z[..., offs:]

    for k in reversed(range(cfg.flows)):
        flow = params["flows"][k]
        n_half = x.shape[-1] // 2
        x0, x1 = x[..., :n_half], x[..., n_half:]
        out = _wn(
            flow["wn"], cfg, x0, cond,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
        )
        b_t, log_s = out[..., :n_half], out[..., n_half:]
        x1 = (x1 - b_t) * jnp.exp(-log_s)
        x = jnp.concatenate([x0, x1], axis=-1)
        x = jnp.einsum("btc,dc->btd", x, flow["convinv"]["w_inv"])
        if k in chunks:
            x = jnp.concatenate([chunks[k], x], axis=-1)

    return x.reshape(b, blocks * cfg.groups)
