"""HiFi-GAN vocoder training CLI.

``python -m larynx_tpu.train_vocoder --wav-dir ... --out-dir ...`` trains
the adversarial vocoder (generator + multi-period/multi-scale
discriminators, feature-matching + mel losses — the original HiFi-GAN
recipe) on random fixed-length audio segments and writes a vocoder model
dir (config.json + generator.npz) loadable by ``get_vocoder_model``.

The reference delegates ALL training to external repos and ships only
inference configs (SURVEY §2.3); this completes the vocoder half of the
in-tree training story the way larynx_tpu.train does for GlowTTS.
"""

import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from larynx_tpu.audio import AudioSettings, mel_basis
from larynx_tpu.io import wavfile
from larynx_tpu.models.glow_tts.data import _pcm_to_float
from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan.training import (
    init_gan_state,
    log_mel,
    make_gan_train_step,
)

_LOGGER = logging.getLogger("larynx_tpu.train_vocoder")

# released vocoder geometries by quality preset (larynx/utils.py:27-31)
GEOMETRY = {
    "high": dict(
        resblock="1", upsample_initial_channel=512,
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
    ),
    "medium": dict(
        resblock="1", upsample_initial_channel=128,
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
    ),
    "low": dict(
        resblock="2", upsample_initial_channel=256,
        upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
    ),
}


def get_args(argv=None):
    parser = argparse.ArgumentParser("larynx-tpu-train-vocoder")
    parser.add_argument("--wav-dir", required=True, help="Directory of .wav files")
    parser.add_argument("--out-dir", required=True, help="Vocoder model dir to write")
    parser.add_argument(
        "--family", choices=("hifi_gan", "waveglow"), default="hifi_gan",
        help="Vocoder family to train (default: hifi_gan)",
    )
    parser.add_argument(
        "--quality", choices=list(GEOMETRY), default="low",
        help="hifi_gan geometry preset (default: low)",
    )
    parser.add_argument(
        "--sigma", type=float, default=1.0,
        help="waveglow training prior sigma (default: 1.0)",
    )
    parser.add_argument(
        "--config", help="JSON with a model section overriding the preset"
    )
    parser.add_argument("--segment-frames", type=int, default=32,
                        help="Mel frames per training segment (default: 32)")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--steps", type=int, default=100000)
    parser.add_argument("--learning-rate", type=float, default=2e-4)
    parser.add_argument("--lr-decay", type=float, default=0.999)
    parser.add_argument("--lr-decay-every", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--checkpoint-every", type=int, default=5000)
    parser.add_argument("--resume", help="generator.npz to resume the generator from")
    parser.add_argument("--debug", action="store_true")
    return parser.parse_args(argv)


def _load_corpus(wav_dir: Path, min_samples: int):
    """[(audio f32 [-1,1], n_samples)] for every usable wav."""
    corpus = []
    for path in sorted(wav_dir.glob("*.wav")):
        try:
            _rate, pcm = wavfile.read(path)
        except Exception:
            _LOGGER.warning("Skipping unreadable %s", path)
            continue
        if pcm.ndim > 1:
            pcm = pcm[:, 0]
        audio = _pcm_to_float(pcm)
        if audio.shape[0] >= min_samples:
            corpus.append(audio)
    return corpus


def _make_mel_fn(settings: AudioSettings, frames: int):
    """Segment audio [B, T] -> generator-input log-mels [B, frames, n_mels]."""
    basis = jnp.asarray(
        mel_basis(
            settings.sample_rate, settings.filter_length,
            settings.mel_channels, settings.mel_fmin, settings.mel_fmax,
        )
    )

    @jax.jit
    def make_mels(audio):
        m = jnp.swapaxes(log_mel(audio, settings, basis), 1, 2)
        have = m.shape[1]
        if have >= frames:
            return m[:, :frames, :]
        return jnp.pad(
            m, ((0, 0), (0, frames - have), (0, 0)),
            constant_values=float(np.log(1e-5)),
        )

    return make_mels


def _sample_batch(rng, corpus, batch_size, seg_samples, up):
    """Hop-aligned random crops so mel frames line up."""
    batch_audio = np.empty((batch_size, seg_samples), np.float32)
    for i in range(batch_size):
        audio = corpus[rng.integers(len(corpus))]
        max_off = (audio.shape[0] - seg_samples) // up
        off = int(rng.integers(max_off + 1)) * up
        batch_audio[i] = audio[off : off + seg_samples]
    return batch_audio


def _train_waveglow(args) -> None:
    from larynx_tpu.models.waveglow import (
        WaveGlowConfig,
        waveglow_config_from_json,
    )
    from larynx_tpu.models.waveglow import model as wg

    if args.config:
        cfg = waveglow_config_from_json(args.config)
    else:
        cfg = WaveGlowConfig()
    # conditioning mels are defined by the model's own geometry: one mel
    # frame per upsample_stride samples at the model's sample rate
    settings = AudioSettings(
        mel_channels=cfg.mel_channels,
        sample_rate=cfg.sampling_rate,
        hop_length=cfg.upsample_stride,
    )
    up = cfg.upsample_stride
    seg_samples = args.segment_frames * up
    corpus = _load_corpus(Path(args.wav_dir), seg_samples + up)
    if not corpus:
        raise SystemExit(
            f"no usable wavs >= {seg_samples + up} samples in {args.wav_dir}"
        )
    _LOGGER.info(
        "Training waveglow on %d file(s), %d-sample segments",
        len(corpus), seg_samples,
    )

    schedule = optax.exponential_decay(
        args.learning_rate, args.lr_decay_every, args.lr_decay
    )
    optimizer = optax.adam(schedule)
    params = wg.init_params(jax.random.PRNGKey(args.seed), cfg)
    if args.resume:
        from larynx_tpu.convert.native import load_params

        params = load_params(args.resume)
        _LOGGER.info("Resumed from %s", args.resume)
    opt_state = optimizer.init(params)
    sigma = args.sigma

    @jax.jit
    def train_step(params, opt_state, audio, mels):
        loss, grads = jax.value_and_grad(wg.loss_fn)(
            params, cfg, audio, mels, sigma
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    make_mels = _make_mel_fn(settings, args.segment_frames)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def save(step: int):
        import dataclasses

        from larynx_tpu.convert.native import save_params
        from larynx_tpu.waveglow import _refresh_inverses

        config_out = dataclasses.asdict(cfg)
        # record the trained prior scale so inference samples from it
        config_out["sigma"] = sigma
        with open(out_dir / "config.json", "w", encoding="utf-8") as f:
            json.dump(config_out, f)
        # training updates convinv.w but w_inv gets zero gradients —
        # recompute so the stored inverse matches the trained weight
        save_params(
            out_dir / "generator.npz",
            _refresh_inverses(jax.device_get(params)),
        )
        _LOGGER.info("Saved waveglow checkpoint at step %s to %s", step, out_dir)

    rng = np.random.default_rng(args.seed)
    step = 0
    t0 = time.time()
    try:
        while step < args.steps:
            batch_audio = _sample_batch(
                rng, corpus, args.batch_size, seg_samples, up
            )
            audio_dev = jnp.asarray(batch_audio)
            params, opt_state, loss = train_step(
                params, opt_state, audio_dev, make_mels(audio_dev)
            )
            step += 1
            if step % 10 == 0:
                _LOGGER.info(
                    "step %s nll %.4f %.2f steps/s",
                    step, float(loss), step / max(time.time() - t0, 1e-9),
                )
            if step % args.checkpoint_every == 0:
                save(step)
    except KeyboardInterrupt:
        _LOGGER.info("Interrupted")
    finally:
        save(step)


def main(argv=None) -> None:
    args = get_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO
    )
    if args.family == "waveglow":
        _train_waveglow(args)
        return

    geometry = dict(GEOMETRY[args.quality])
    if args.config:
        with open(args.config, "r", encoding="utf-8") as f:
            loaded = json.load(f)
        model = loaded.get("model", loaded)
        known = set(HiFiGanConfig.__dataclass_fields__)
        geometry.update(
            {
                k: tuple(tuple(x) if isinstance(x, list) else x for x in v)
                if isinstance(v, list)
                else v
                for k, v in model.items()
                if k in known
            }
        )
    cfg = HiFiGanConfig(**geometry)
    settings = AudioSettings()
    up = cfg.total_upsample
    seg_samples = args.segment_frames * up

    corpus = _load_corpus(Path(args.wav_dir), seg_samples + up)
    if not corpus:
        raise SystemExit(
            f"no usable wavs >= {seg_samples + up} samples in {args.wav_dir}"
        )
    _LOGGER.info(
        "Training %s vocoder on %d file(s), %d-sample segments",
        args.quality, len(corpus), seg_samples,
    )

    schedule = optax.exponential_decay(
        args.learning_rate, args.lr_decay_every, args.lr_decay
    )
    gen_opt = optax.adam(schedule, b1=0.8, b2=0.99)
    disc_opt = optax.adam(schedule, b1=0.8, b2=0.99)
    state = init_gan_state(jax.random.PRNGKey(args.seed), cfg, gen_opt, disc_opt)
    if args.resume:
        from larynx_tpu.convert.native import load_params

        object.__setattr__(state, "gen_params", load_params(args.resume))
        _LOGGER.info("Resumed generator from %s", args.resume)
    # DP mesh over every device (params replicated, batch row-sharded) —
    # symmetric with the GlowTTS training CLI's sharded step
    mesh = None
    if len(jax.devices()) > 1 and args.batch_size % len(jax.devices()) == 0:
        from larynx_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(model_parallel=1)
        _LOGGER.info("Mesh: %s", dict(mesh.shape))
    train_step = make_gan_train_step(
        cfg, settings, gen_opt, disc_opt, mesh=mesh
    )

    make_mels = _make_mel_fn(settings, args.segment_frames)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def save(step: int):
        from larynx_tpu.convert.native import save_params

        with open(out_dir / "config.json", "w", encoding="utf-8") as f:
            json.dump(
                {
                    "audio": {
                        "num_mels": settings.mel_channels,
                        "sampling_rate": settings.sample_rate,
                    },
                    "model": {
                        k: list(v) if isinstance(v, tuple) else v
                        for k, v in geometry.items()
                    },
                },
                f,
            )
        save_params(out_dir / "generator.npz", jax.device_get(state.gen_params))
        _LOGGER.info("Saved vocoder checkpoint at step %s to %s", step, out_dir)

    rng = np.random.default_rng(args.seed)
    step = 0
    t0 = time.time()
    try:
        while step < args.steps:
            batch_audio = _sample_batch(
                rng, corpus, args.batch_size, seg_samples, up
            )
            audio_dev = jnp.asarray(batch_audio)
            batch = {"mels": make_mels(audio_dev), "audio": audio_dev}
            state, metrics = train_step(state, batch)
            step += 1
            if step % 10 == 0:
                _LOGGER.info(
                    "step %s d %.4f g %.4f (mel_l1 %.4f) %.2f steps/s",
                    step,
                    float(metrics["d_loss"]),
                    float(metrics["g_loss"]),
                    float(metrics["mel_l1"]),
                    step / max(time.time() - t0, 1e-9),
                )
            if step % args.checkpoint_every == 0:
                save(step)
    except KeyboardInterrupt:
        _LOGGER.info("Interrupted")
    finally:
        save(step)


if __name__ == "__main__":
    main()
