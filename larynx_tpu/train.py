"""Acoustic-model training CLI: ``python -m larynx_tpu.train``.

The reference keeps training in external repos (glow-tts-train); this is
the TPU-native equivalent: data-parallel (+ encoder tensor-parallel) MLE
training over a device mesh, producing a voice directory the inference
pipeline loads directly (generator.npz + config.json + phonemes.txt).

``--family tacotron2`` trains the second acoustic family instead
(teacher-forced MSE+gate objective, NVIDIA recipe: Adam + weight decay
1e-6 — models/tacotron2/training.py); the reference declares the family
(larynx/constants.py:22) but ships neither inference nor training for it.
Name the output dir ``<voice>-tacotron2`` so the pipeline routes it to
the right loader (the ``-<model_type>`` dir suffix is the reference's
layout contract).
"""

import argparse
import json
import logging
import shutil
import time
from pathlib import Path

import jax
import jax.numpy as jnp

from larynx_tpu.audio import AudioSettings
from larynx_tpu.convert.native import save_params
from larynx_tpu.models.glow_tts import config_from_voice_json, init_params
from larynx_tpu.models.glow_tts.data import Dataset
from larynx_tpu.parallel.mesh import make_mesh, shard_params
from larynx_tpu.parallel.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from larynx_tpu.text.ids import load_phoneme_ids

_LOGGER = logging.getLogger("larynx_tpu.train")


def get_args(argv=None):
    parser = argparse.ArgumentParser(prog="larynx-tpu.train")
    parser.add_argument(
        "--family", choices=("glow_tts", "tacotron2"), default="glow_tts",
        help="Acoustic-model family to train (default: glow_tts)",
    )
    parser.add_argument("--metadata", required=True, help="metadata.csv (id|text)")
    parser.add_argument("--wav-dir", required=True, help="Directory of <id>.wav files")
    parser.add_argument(
        "--output-dir", required=True,
        help="Voice dir to write (generator.npz/config.json/phonemes.txt)",
    )
    parser.add_argument(
        "--config", help="Voice config.json to train with (defaults: harvard dims)"
    )
    parser.add_argument(
        "--phonemes", required=True, help="phonemes.txt (id<space>phoneme per line)"
    )
    parser.add_argument("--language", default="en-us")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--warmup-steps", type=int, default=4000)
    parser.add_argument(
        "--learning-rate", type=float, default=1e-3,
        help="Peak learning rate (tacotron2 family; NVIDIA default 1e-3)",
    )
    parser.add_argument("--grad-clip", type=float, default=5.0)
    parser.add_argument("--max-id-len", type=int, default=192)
    parser.add_argument("--max-mel-len", type=int, default=1024)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument(
        "--model-parallel", type=int, default=None,
        help="TP axis size (default: 2 when device count is even)",
    )
    parser.add_argument(
        "--checkpoint-every", type=int, default=1000, help="Steps between saves"
    )
    parser.add_argument("--resume", help="generator.npz to resume from")
    parser.add_argument(
        "--ddi", action="store_true",
        help="Data-dependent ActNorm init from the first batch",
    )
    parser.add_argument("--debug", action="store_true")
    return parser.parse_args(argv)


def _train_tacotron2(args, raw_config, dataset, mesh, out_dir) -> None:
    """Teacher-forced Tacotron2 loop (NVIDIA recipe: Adam, wd 1e-6)."""
    import optax

    from larynx_tpu.models.tacotron2 import tacotron2_config_from_voice_json
    from larynx_tpu.models.tacotron2.training import (
        Tacotron2TrainState,
        init_train_state,
        make_train_step,
    )

    cfg = tacotron2_config_from_voice_json(raw_config)
    schedule = optax.linear_schedule(
        init_value=0.0,
        end_value=args.learning_rate,
        transition_steps=max(args.warmup_steps, 1),
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.adamw(learning_rate=schedule, weight_decay=1e-6),
    )

    if args.resume:
        from larynx_tpu.convert.native import load_params

        params = load_params(args.resume)
        state = Tacotron2TrainState(
            params=params,
            opt=optimizer.init(params),
            step=jnp.zeros((), dtype=jnp.int32),
        )
        _LOGGER.info("Resumed parameters from %s", args.resume)
    else:
        state = init_train_state(
            jax.random.PRNGKey(args.seed), cfg, optimizer
        )
    train_step = make_train_step(cfg, optimizer, mesh=mesh)
    dropout_base = jax.random.PRNGKey(args.seed + 1)

    def save(step: int):
        save_params(out_dir / "generator.npz", jax.device_get(state.params))
        _LOGGER.info("Saved checkpoint at step %s to %s", step, out_dir)

    step = 0
    try:
        for epoch in range(args.epochs):
            epoch_start = time.time()
            losses = []
            for batch in dataset.batches(
                args.batch_size,
                max_id_len=args.max_id_len,
                max_mel_len=args.max_mel_len,
                shuffle_seed=args.seed + epoch,
            ):
                state, metrics = train_step(
                    state, batch, jax.random.fold_in(dropout_base, step)
                )
                step += 1
                losses.append(metrics["loss"])
                if step % 10 == 0:
                    _LOGGER.info(
                        "step %s loss %.4f (mel %.4f/%.4f gate %.4f)",
                        step,
                        float(metrics["loss"]),
                        float(metrics["mel_pre"]),
                        float(metrics["mel_post"]),
                        float(metrics["gate"]),
                    )
                if step % args.checkpoint_every == 0:
                    save(step)
            _LOGGER.info(
                "epoch %s done in %.1fs mean loss %.4f",
                epoch,
                time.time() - epoch_start,
                float(jnp.mean(jnp.stack(losses))) if losses else float("nan"),
            )
    except KeyboardInterrupt:
        _LOGGER.info("Interrupted")
    finally:
        save(step)


def main(argv=None) -> None:
    args = get_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    if args.config:
        with open(args.config, encoding="utf-8") as f:
            raw_config = json.load(f)
    else:
        raw_config = {"audio": {}, "model": {}}
    audio_cfg = dict(raw_config.get("audio", {}))
    known = set(AudioSettings.__dataclass_fields__)
    settings = AudioSettings(**{k: v for k, v in audio_cfg.items() if k in known})

    with open(args.phonemes, encoding="utf-8") as f:
        phoneme_to_id = load_phoneme_ids(f)

    dataset = Dataset(
        args.metadata, args.wav_dir, phoneme_to_id, settings, lang=args.language
    )
    _LOGGER.info("Dataset: %s utterances", len(dataset))

    mesh = make_mesh(model_parallel=args.model_parallel)
    _LOGGER.info("Mesh: %s", dict(mesh.shape))

    if args.family == "tacotron2":
        # size the symbol table from the phoneme set so the written
        # config.json reloads the exact trained geometry
        model_cfg = raw_config.setdefault("model", {})
        model_cfg.setdefault("num_symbols", max(phoneme_to_id.values()) + 1)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "config.json", "w", encoding="utf-8") as f:
        json.dump(raw_config, f, indent=2)
    shutil.copyfile(args.phonemes, out_dir / "phonemes.txt")

    if args.family == "tacotron2":
        _train_tacotron2(args, raw_config, dataset, mesh, out_dir)
        return

    cfg = config_from_voice_json(raw_config)

    if args.resume:
        from larynx_tpu.convert.native import load_params

        params = load_params(args.resume)
        _LOGGER.info("Resumed parameters from %s", args.resume)
    else:
        params = init_params(jax.random.PRNGKey(args.seed), cfg)
    params = shard_params(params, mesh)

    optimizer = make_optimizer(
        cfg, warmup_steps=args.warmup_steps, grad_clip=args.grad_clip
    )
    state = init_train_state(params, optimizer)
    train_step = make_train_step(cfg, optimizer, mesh=mesh)

    def save(step: int):
        save_params(out_dir / "generator.npz", jax.device_get(state.params))
        _LOGGER.info("Saved checkpoint at step %s to %s", step, out_dir)

    if args.ddi and not args.resume:
        from larynx_tpu.models.glow_tts.training import actnorm_ddi_init

        first = next(
            dataset.batches(
                args.batch_size,
                max_id_len=args.max_id_len,
                max_mel_len=args.max_mel_len,
                shuffle_seed=args.seed,
            ),
            None,
        )
        if first is not None:
            _LOGGER.info("Running data-dependent ActNorm init")
            params = actnorm_ddi_init(
                state.params,
                cfg,
                jnp.asarray(first["mels"]),
                jnp.asarray(first["mel_lengths"]),
            )
            state = init_train_state(shard_params(params, mesh), optimizer)

    step = 0
    try:
        for epoch in range(args.epochs):
            epoch_start = time.time()
            losses = []
            for batch in dataset.batches(
                args.batch_size,
                max_id_len=args.max_id_len,
                max_mel_len=args.max_mel_len,
                shuffle_seed=args.seed + epoch,
            ):
                state, metrics = train_step(state, batch)
                step += 1
                # keep metrics on device: a float() per step would block
                # on a device->host round trip and serialize dispatch
                losses.append(metrics["loss"])
                if step % 10 == 0:
                    _LOGGER.info(
                        "step %s loss %.4f (mle %.4f dur %.4f)",
                        step,
                        float(metrics["loss"]),
                        float(metrics["mle_loss"]),
                        float(metrics["duration_loss"]),
                    )
                if step % args.checkpoint_every == 0:
                    save(step)
            _LOGGER.info(
                "epoch %s done in %.1fs mean loss %.4f",
                epoch,
                time.time() - epoch_start,
                # one device reduction + one scalar transfer, not a
                # blocking round trip per step
                float(jnp.mean(jnp.stack(losses)))
                if losses
                else float("nan"),
            )
    except KeyboardInterrupt:
        _LOGGER.info("Interrupted")
    finally:
        save(step)


if __name__ == "__main__":
    main()
