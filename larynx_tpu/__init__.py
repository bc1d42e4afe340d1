"""larynx_tpu — TPU-native neural text-to-speech.

A from-scratch JAX/XLA rebuild of the Larynx TTS pipeline: text -> IPA
phonemes -> ids -> mel spectrograms (GlowTTS) -> waveform (HiFi-GAN or
Griffin-Lim).  Public surface mirrors the reference package
(larynx/__init__.py): ``text_to_speech()``, ``get_tts_model()``,
``get_vocoder_model()``, ``load_tts_model()``, ``load_vocoder_model()``.

Unlike the reference — which runs ONNX Runtime per sentence at batch 1 —
sentences are batched into bucketed static-shape XLA programs and the whole
mel->audio path stays on device (see larynx_tpu.runtime.engine).
"""

import logging
import os
import time
import typing
from concurrent.futures import Executor
from pathlib import Path

import numpy as np

from larynx_tpu.audio import AudioSettings
from larynx_tpu.constants import (
    InferenceBackend,
    TextToSpeechModel,
    TextToSpeechModelConfig,
    TextToSpeechResult,
    TextToSpeechType,
    VocoderModel,
    VocoderModelConfig,
    VocoderQuality,
    VocoderType,
)
from larynx_tpu.text.frontend import sentences as frontend_sentences
from larynx_tpu.text.ids import load_phoneme_ids, phonemes_to_ids
from larynx_tpu.text.langs import resolve_lang
from larynx_tpu.voices import (
    DEFAULT_VOICE_URL_FORMAT,
    VOCODER_ALIASES,
    VOCODER_QUALITY,
    download_voice,
    get_voice_download_name,
    get_voices_dirs,
    resolve_voice_name,
    split_voice_name,
    valid_voice_dir,
)

_LOGGER = logging.getLogger("larynx_tpu")

__version__ = "1.0.0"

_DEFAULT_AUDIO_SETTINGS = AudioSettings()

# -----------------------------------------------------------------------------


def text_to_speech(
    text: str,
    voice_or_lang: str = "en-us",
    vocoder_or_quality: typing.Union[str, VocoderQuality] = VocoderQuality.HIGH,
    ssml: bool = False,
    backend: typing.Optional[InferenceBackend] = None,
    tts_settings: typing.Optional[typing.Dict[str, typing.Any]] = None,
    vocoder_settings: typing.Optional[typing.Dict[str, typing.Any]] = None,
    denoiser_strength: float = 0.0,
    use_cuda: bool = False,  # accepted for API parity; TPU is the device
    half: bool = False,
    executor: typing.Optional[Executor] = None,
    custom_voices_dir: typing.Optional[typing.Union[str, Path]] = None,
    url_format: str = DEFAULT_VOICE_URL_FORMAT,
    max_batch: int = 8,
    seed: typing.Optional[int] = None,
    scheduler: typing.Optional[typing.Any] = None,
    interleaved_batching: typing.Optional[bool] = None,
    no_download: bool = False,
    audio_settings_overrides: typing.Optional[
        typing.Dict[str, typing.Any]
    ] = None,
) -> typing.Iterable[TextToSpeechResult]:
    """Synthesize text into per-sentence audio results.

    Parity surface: larynx/__init__.py:47-190.  Sentences sharing a voice
    are batched through bucketed XLA programs instead of fanning out to a
    thread pool at batch 1.

    ``interleaved_batching`` additionally batches *non-consecutive*
    same-voice sentences of a multi-voice (SSML) document together; audio
    is still yielded in document order, but time-to-first-audio grows to
    roughly the whole document's synthesis time.  Defaults to the
    ``LARYNX_TPU_INTERLEAVED_BATCHING`` env var (off).
    """
    if interleaved_batching is None:
        interleaved_batching = os.environ.get(
            "LARYNX_TPU_INTERLEAVED_BATCHING", ""
        ).lower() in ("1", "true", "yes")
    jobs = _build_jobs(
        text, voice_or_lang, vocoder_or_quality, ssml=ssml, backend=backend,
        half=half, denoiser_strength=denoiser_strength,
        custom_voices_dir=custom_voices_dir, url_format=url_format,
        no_download=no_download,
        audio_settings_overrides=audio_settings_overrides,
    )
    if not jobs:
        return

    # Fused fast path: group consecutive same-(voice,vocoder) sentences and
    # run them batched through one SynthesisEngine.
    yield from _run_jobs(
        jobs,
        tts_settings=tts_settings,
        vocoder_settings=vocoder_settings,
        denoiser_strength=denoiser_strength,
        max_batch=max_batch,
        seed=seed,
        half=half,
        scheduler=scheduler,
        interleaved=interleaved_batching,
    )


def stream_text_to_speech(
    text: str,
    voice_or_lang: str = "en-us",
    vocoder_or_quality: typing.Union[str, VocoderQuality] = VocoderQuality.HIGH,
    ssml: bool = False,
    backend: typing.Optional[InferenceBackend] = None,
    tts_settings: typing.Optional[typing.Dict[str, typing.Any]] = None,
    denoiser_strength: float = 0.0,
    half: bool = False,
    custom_voices_dir: typing.Optional[typing.Union[str, Path]] = None,
    url_format: str = DEFAULT_VOICE_URL_FORMAT,
    seed: typing.Optional[int] = None,
    chunk_frames: int = 64,
) -> typing.Iterator[np.ndarray]:
    """Low-latency streaming synthesis: yields int16 audio chunks.

    Unlike :func:`text_to_speech` (which yields whole sentences), audio
    arrives in ``chunk_frames``-mel chunks as the vocoder produces them —
    time-to-first-audio is one chunk instead of a whole utterance.  SSML
    pauses become silence chunks.  Audio is emitted at fixed gain (no
    per-utterance peak normalization; the vocoder's tanh bounds the
    waveform).  Requires the fused HiFi-GAN engine; no reference
    equivalent (larynx's --raw-stream streams per *sentence*).
    """
    noise_scale = 0.667
    length_scale = 1.0
    if tts_settings:
        noise_scale = float(tts_settings.get("noise_scale", noise_scale))
        length_scale = float(tts_settings.get("length_scale", length_scale))

    jobs = _build_jobs(
        text, voice_or_lang, vocoder_or_quality, ssml=ssml, backend=backend,
        half=half, denoiser_strength=denoiser_strength,
        custom_voices_dir=custom_voices_dir, url_format=url_format,
    )
    for index, job in enumerate(jobs):
        engine = _get_engine(job["tts_model"], job["vocoder_model"], half=half)
        settings = job["audio_settings"]
        before = max(0, (job["pause_before_ms"] * settings.sample_rate) // 1000)
        if before:
            yield np.zeros(before, dtype=np.int16)
        if engine is not None and engine.vocoder_kind == "hifi_gan":
            yield from engine.synthesize_stream(
                job["ids"],
                noise_scale=noise_scale,
                length_scale=length_scale,
                seed=None if seed is None else seed + index,
                denoiser_strength=denoiser_strength,
                chunk_frames=chunk_frames,
            )
        else:  # griffin_lim / custom models: one chunk per sentence
            audio = _sentence_task_fallback(
                job, tts_settings, {"denoiser_strength": denoiser_strength}
            )
            yield audio
        after = max(0, (job["pause_after_ms"] * settings.sample_rate) // 1000)
        if after:
            yield np.zeros(after, dtype=np.int16)


def _build_jobs(
    text,
    voice_or_lang,
    vocoder_or_quality,
    ssml=False,
    backend=None,
    half=False,
    denoiser_strength=0.0,
    custom_voices_dir=None,
    url_format=DEFAULT_VOICE_URL_FORMAT,
    no_download=False,
    audio_settings_overrides=None,
):
    """Frontend + model resolution -> per-sentence job dicts (shared by
    batch and streaming synthesis)."""
    resolved_name = resolve_voice_name(voice_or_lang)
    try:
        voice_lang, _voice_name, _voice_type = split_voice_name(resolved_name)
    except ValueError:
        voice_lang = voice_or_lang
    voice_lang = resolve_lang(voice_lang)

    # Collect sentences with per-sentence voice resolution (SSML multi-voice)
    jobs: typing.List[typing.Dict[str, typing.Any]] = []
    for sentence in frontend_sentences(
        text, lang=voice_lang, ssml=ssml, explicit_lang=False
    ):
        tts_model = None
        tts_model_names = []
        if sentence.voice:
            tts_model_names.append(sentence.voice)
        if sentence.lang:
            if resolve_lang(sentence.lang) == voice_lang:
                tts_model_names.append(resolved_name)
            else:
                tts_model_names.append(sentence.lang)
        tts_model_names.append(resolved_name)
        tts_model_names.append(voice_or_lang)

        for tts_voice_name in filter(None, tts_model_names):
            tts_model = get_tts_model(
                tts_voice_name,
                backend=backend,
                half=half,
                custom_voices_dir=custom_voices_dir,
                url_format=url_format,
                no_download=no_download,
                audio_settings_overrides=audio_settings_overrides,
            )
            if tts_model is not None:
                break
        assert tts_model is not None, "Failed to load voice"

        vocoder_model = get_vocoder_model(
            vocoder_or_quality,
            backend=backend,
            half=half,
            denoiser_strength=denoiser_strength,
            custom_voices_dir=custom_voices_dir,
            url_format=url_format,
            no_download=no_download,
        )
        assert vocoder_model is not None, "Failed to load vocoder"

        phoneme_to_id = getattr(tts_model, "phoneme_to_id", {})
        audio_settings = getattr(tts_model, "audio_settings", None)
        if audio_settings is None:
            audio_settings = _DEFAULT_AUDIO_SETTINGS

        sent_phonemes = [w.phonemes for w in sentence if w.phonemes]
        sent_phoneme_ids = phonemes_to_ids(sent_phonemes, phoneme_to_id)
        _LOGGER.debug("%s %s %s", sentence.text, sent_phonemes, sent_phoneme_ids)

        pause_before_ms = sentence.pause_before_ms
        pause_after_ms = sentence.pause_after_ms
        if sentence.words:
            pause_before_ms += sentence.words[0].pause_before_ms
            pause_after_ms += sentence.words[-1].pause_after_ms

        marks_before = list(sentence.marks_before)
        marks_after = list(sentence.marks_after)
        for word_idx, word in enumerate(sentence):
            if word.marks_before:
                if word_idx == 0:
                    marks_before.extend(word.marks_before)
                else:
                    marks_after.extend(word.marks_before)
            if word.marks_after:
                marks_after.extend(word.marks_after)

        jobs.append(
            {
                "ids": np.asarray(sent_phoneme_ids, dtype=np.int64),
                "tts_model": tts_model,
                "vocoder_model": vocoder_model,
                "audio_settings": audio_settings,
                "pause_before_ms": pause_before_ms,
                "pause_after_ms": pause_after_ms,
                "result": TextToSpeechResult(
                    text=sentence.text_with_ws,
                    audio=None,
                    sample_rate=audio_settings.sample_rate,
                    marks_before=marks_before,
                    marks_after=marks_after,
                ),
            }
        )

    return jobs


def _run_jobs(
    jobs,
    tts_settings,
    vocoder_settings,
    denoiser_strength,
    max_batch,
    seed,
    half,
    scheduler=None,
    interleaved=False,
):
    from larynx_tpu.runtime.buckets import BucketPolicy

    noise_scale = 0.667
    length_scale = 1.0
    if tts_settings:
        noise_scale = float(tts_settings.get("noise_scale", noise_scale))
        length_scale = float(tts_settings.get("length_scale", length_scale))
    if vocoder_settings:
        denoiser_strength = float(
            vocoder_settings.get("denoiser_strength", denoiser_strength)
        )

    if scheduler is not None:
        # Cross-request coalescing: enqueue every sentence into the shared
        # scheduler, then resolve in order.  Jobs from concurrent requests
        # interleave inside the scheduler's batch window.
        futures = []
        for job in jobs:
            engine = _get_engine(job["tts_model"], job["vocoder_model"], half=half)
            if engine is None:
                futures.append(None)
                continue
            futures.append(
                scheduler.submit(
                    engine,
                    job["ids"],
                    noise_scale=noise_scale,
                    length_scale=length_scale,
                    denoiser_strength=denoiser_strength,
                    seed=seed,
                )
            )
        for job, future in zip(jobs, futures):
            if future is None:
                audio = _sentence_task_fallback(job, tts_settings, vocoder_settings)
            else:
                audio = future.result()
            settings = job["audio_settings"]
            before = max(0, (job["pause_before_ms"] * settings.sample_rate) // 1000)
            after = max(0, (job["pause_after_ms"] * settings.sample_rate) // 1000)
            if before > 0 or after > 0:
                audio = np.pad(audio, pad_width=(before, after), constant_values=0)
            job["result"].audio = audio
            yield job["result"]
        return

    # Group jobs by (tts_model, vocoder_model).  By default only
    # *consecutive* same-model runs batch (keeps time-to-first-audio
    # streaming).  With interleaved batching, same-voice sentences scattered
    # through a multi-voice SSML document batch together — much better MXU
    # utilization, but first audio now waits for every earlier sentence's
    # group to finish, so it is opt-in.
    groups: typing.List[typing.List[int]] = []
    if interleaved:
        group_of: typing.Dict[typing.Tuple[int, int], int] = {}
        for i, job in enumerate(jobs):
            key = (id(job["tts_model"]), id(job["vocoder_model"]))
            if key in group_of:
                groups[group_of[key]].append(i)
            else:
                group_of[key] = len(groups)
                groups.append([i])
    else:
        for i, job in enumerate(jobs):
            if groups and (
                jobs[groups[-1][0]]["tts_model"] is job["tts_model"]
                and jobs[groups[-1][0]]["vocoder_model"] is job["vocoder_model"]
            ):
                groups[-1].append(i)
            else:
                groups.append([i])

    # Results always stream in document order: a drain pointer yields each
    # job as soon as it and everything before it is done.
    done = [False] * len(jobs)
    next_to_yield = 0

    # Flatten groups into per-engine batch units (same text bucket).
    units: typing.List[typing.Tuple[typing.Any, typing.List[int]]] = []
    for group in groups:
        tts_model = jobs[group[0]]["tts_model"]
        vocoder_model = jobs[group[0]]["vocoder_model"]
        engine = _get_engine(tts_model, vocoder_model, half=half)
        lengths = [len(jobs[i]["ids"]) for i in group]
        policy = engine.policy if engine is not None else BucketPolicy()
        for batch in policy.group_by_text_bucket(lengths, max_batch):
            units.append((engine, [group[k] for k in batch]))

    # Pipelined execution: a dispatch round trip to the (remote) TPU costs
    # tens of ms, so (1) every unit's encode launches before any sync, and
    # (2) unit j+1's decode+vocode launch before unit j's audio transfer is
    # collected — device compute overlaps both dispatch latency and the
    # slow device->host link.
    encodes: typing.List[typing.Any] = []
    for j, (engine, indices) in enumerate(units):
        if engine is None:
            encodes.append(None)
            continue
        t0 = time.perf_counter()
        enc_out, g = engine.encode_launch(
            [jobs[i]["ids"] for i in indices], length_scale=length_scale
        )
        encodes.append((enc_out, g, t0))

    # Vocode pooling: units that share a vocoder (a multi-voice SSML
    # document switches GlowTTS voices but keeps one HiFi-GAN) vocode as
    # a SINGLE ragged launch — one dispatch chain and one device->host
    # audio stream instead of one per voice (concurrent D2H copies
    # through the tunnel are pathological; each extra dispatch is a
    # ~24 ms round trip).  Units that cannot pool (seeded requests, mesh
    # mode, griffin_lim/none vocoders) form singleton pools and behave
    # exactly as before.
    from larynx_tpu.runtime.engine import (
        _pool_rows,
        ramp_min_bytes,
        vocode_pool_enabled,
    )

    pool_ids: typing.List[int] = [0] * len(units)
    pools: typing.List[typing.List[int]] = []
    pool_key_of: typing.Dict[typing.Tuple[int, bool], int] = {}
    for j, (engine, indices) in enumerate(units):
        key = None
        if (
            vocode_pool_enabled()
            and seed is None
            and engine is not None
            and engine.mesh is None
            and engine.vocoder_kind in ("hifi_gan", "waveglow")
        ):
            key = (id(jobs[indices[0]]["vocoder_model"]), engine.vocoder_half)
        if key is not None and key in pool_key_of:
            p = pool_key_of[key]
            pools[p].append(j)
        else:
            p = len(pools)
            if key is not None:
                pool_key_of[key] = p
            pools.append([j])
        pool_ids[j] = p

    pool_tails: typing.List[typing.Optional[dict]] = [None] * len(pools)

    def launch_pool(p: int) -> None:
        members = [j for j in pools[p] if encodes[j] is not None]
        if pool_tails[p] is not None or not members:
            return
        # predictive bucket: each decode dispatch overlaps its y_lengths
        # device->host round trip (engine.decode_launch_predicted)
        decs = []
        for j in members:
            engine, indices = units[j]
            enc_out, g, _t0 = encodes[j]
            decs.append(
                engine.decode_launch_predicted(
                    enc_out, g, len(indices),
                    max_id_len=max(len(jobs[i]["ids"]) for i in indices),
                    noise_scale=noise_scale, length_scale=length_scale,
                    seed=seed, batch_index=j,
                )
            )
        n_valids = tuple(len(units[j][1]) for j in members)
        bytes_of = {
            j: int(np.sum(np.asarray(d[3])[:nv])) * units[j][0].upsample * 2
            for j, d, nv in zip(members, decs, n_valids)
        }
        tail: dict = {"bytes_of": bytes_of}
        # pooling only pays in the dispatch-bound regime; once the audio
        # itself is the wall (>= ramp_min_bytes) per-unit launches keep
        # the per-unit transfer overlapping the next unit's compute
        if (
            len(members) > 1
            and sum(bytes_of.values()) < ramp_min_bytes()
            and len({d[0].shape[2] for d in decs}) == 1
        ):
            eng0 = units[members[0]][0]
            m_pool = max(d[0].shape[1] for d in decs)
            mel_p, mask_p = _pool_rows(
                tuple(d[0] for d in decs),
                tuple(d[1] for d in decs),
                n_valids, m_pool,
            )
            y_pool = np.concatenate(
                [np.asarray(d[3])[:nv] for d, nv in zip(decs, n_valids)]
            )
            parts = eng0.vocode_launch(
                mel_p, mask_p, int(sum(n_valids)), denoiser_strength,
                decs[0][2], y_lengths=y_pool,
            )
            offs = np.concatenate([[0], np.cumsum(n_valids)])
            tail.update(
                mode="pooled", parts=parts, y_pool=y_pool, eng0=eng0,
                total_rows=int(sum(n_valids)),
                span={
                    j: (int(offs[i]), int(n_valids[i]))
                    for i, j in enumerate(members)
                },
            )
        else:
            per = {}
            for j, (mel, z_mask, key_j, y_lengths) in zip(members, decs):
                engine, indices = units[j]
                per[j] = (
                    engine.vocode_launch(
                        mel, z_mask, len(indices), denoiser_strength,
                        key_j, y_lengths=y_lengths,
                    ),
                    y_lengths,
                    mel.shape[0],
                )
            tail.update(mode="per_unit", per=per)
        pool_tails[p] = tail

    def tail_bytes(j: int) -> int:
        """Actual int16 audio bytes of a launched unit (y_lengths are on
        host by the time launch_pool returns)."""
        tail = pool_tails[pool_ids[j]]
        if tail is None:
            return 0
        return tail["bytes_of"].get(j, 0)

    # Adaptive lookahead: one unit ahead always (overlaps unit j's audio
    # transfer with j+1's compute), deeper while the in-flight audio is
    # small — for a multi-voice SSML document the units are a few hundred
    # KB each and the wall is the per-unit dispatch round trips, so every
    # tail should be on the device before the first blocking collect.
    # Large batches still stop at one unit of lookahead: their in-flight
    # bytes exceed the gate and the link is the wall anyway.
    launched = 0
    inflight_bytes = 0

    def launch_ahead(j_current: int) -> None:
        nonlocal launched, inflight_bytes
        while launched < len(units):
            deep = launched > j_current + 1
            if deep and inflight_bytes >= ramp_min_bytes():
                break
            launch_pool(pool_ids[launched])
            inflight_bytes += tail_bytes(launched)
            launched += 1

    if units:
        launch_ahead(-1)
    for j, (engine, indices) in enumerate(units):
        launch_ahead(j)
        if encodes[j] is None:
            start = time.perf_counter()
            audios = [
                _sentence_task_fallback(jobs[i], tts_settings, vocoder_settings)
                for i in indices
            ]
            elapsed = time.perf_counter() - start
        else:
            tail = pool_tails[pool_ids[j]]
            t0 = encodes[j][2]
            if tail["mode"] == "pooled":
                if "rows_np" not in tail:
                    tail["rows_np"] = tail["eng0"].vocode_collect(
                        tail["parts"], tail["total_rows"]
                    )
                off, nv = tail["span"][j]
                audios = engine.crop_rows(
                    tail["rows_np"][off : off + nv],
                    tail["y_pool"][off : off + nv], nv, denoiser_strength,
                )
            else:
                parts, y_lengths, b_rows = tail["per"][j]
                audio_rows = engine.vocode_collect(parts, b_rows)
                audios = engine.crop_rows(
                    audio_rows, y_lengths, len(indices), denoiser_strength
                )
            inflight_bytes -= tail_bytes(j)
            elapsed = time.perf_counter() - t0

        for i, audio in zip(indices, audios):
            job = jobs[i]
            settings = job["audio_settings"]
            audio_sec = audio.shape[-1] / settings.sample_rate
            rtf = elapsed / max(audio_sec, 1e-9) / len(indices)
            _LOGGER.debug(
                "Real-time factor: %0.2f (infer=%0.2f sec, audio=%0.2f sec)",
                rtf,
                elapsed / len(indices),
                audio_sec,
            )
            before = max(
                0, (job["pause_before_ms"] * settings.sample_rate) // 1000
            )
            after = max(
                0, (job["pause_after_ms"] * settings.sample_rate) // 1000
            )
            if before > 0 or after > 0:
                audio = np.pad(
                    audio, pad_width=(before, after), constant_values=0
                )
            job["result"].audio = audio
            done[i] = True

        while next_to_yield < len(jobs) and done[next_to_yield]:
            yield jobs[next_to_yield]["result"]
            next_to_yield += 1


def _sentence_task_fallback(job, tts_settings, vocoder_settings) -> np.ndarray:
    """Unfused path through the public model interfaces (kept for parity
    and for custom model classes; mirrors larynx/__init__.py:214-285)."""
    from larynx_tpu.audio import audio_float_to_int16

    tts_model = job["tts_model"]
    vocoder_model = job["vocoder_model"]
    settings = job["audio_settings"]

    mels = tts_model.phonemes_to_mels(job["ids"], settings=tts_settings)
    if settings.signal_norm:
        mels = settings.denormalize(mels)
    if settings.convert_db_to_amp:
        mels = settings.db_to_amp(mels)
    if settings.do_dynamic_range_compression:
        mels = settings.dynamic_range_compression(mels)
    audio = vocoder_model.mels_to_audio(mels, settings=vocoder_settings)
    if audio.dtype != np.int16:
        audio = audio_float_to_int16(audio)
    return audio


# -----------------------------------------------------------------------------
# Engine cache: one fused engine per (voice params, vocoder params) pair

_ENGINE_CACHE: typing.Dict[typing.Tuple[int, int, bool], typing.Any] = {}


def _get_engine(tts_model, vocoder_model, half: bool = False):
    """Build/cache a fused SynthesisEngine when both models are native."""
    from larynx_tpu.glow_tts import GlowTextToSpeech
    from larynx_tpu.hifi_gan import HiFiGanVocoder
    from larynx_tpu.griffin_lim import GriffinLimVocoder
    from larynx_tpu.runtime.engine import SynthesisEngine

    key = (id(tts_model), id(vocoder_model), half)
    if key in _ENGINE_CACHE:
        return _ENGINE_CACHE[key]

    engine = None
    if isinstance(tts_model, GlowTextToSpeech):
        from larynx_tpu.parallel.mesh import serving_mesh

        mesh = serving_mesh()  # None on a single device
        settings = tts_model.audio_settings or _DEFAULT_AUDIO_SETTINGS
        if isinstance(vocoder_model, HiFiGanVocoder):
            engine = SynthesisEngine(
                tts_model.params,
                tts_model.model_config,
                settings,
                vocoder_kind="hifi_gan",
                vocoder_params=vocoder_model.params,
                vocoder_cfg=vocoder_model.model_config,
                half=half,
                mesh=mesh,
            )
        elif isinstance(vocoder_model, GriffinLimVocoder):
            engine = SynthesisEngine(
                tts_model.params,
                tts_model.model_config,
                settings,
                vocoder_kind="griffin_lim",
                half=half,
                mesh=mesh,
            )
        else:
            from larynx_tpu.waveglow import WaveGlowVocoder

            if isinstance(vocoder_model, WaveGlowVocoder):
                engine = SynthesisEngine(
                    tts_model.params,
                    tts_model.model_config,
                    settings,
                    vocoder_kind="waveglow",
                    vocoder_params=vocoder_model.params,
                    vocoder_cfg=vocoder_model.model_config,
                    half=half,
                    mesh=mesh,
                    waveglow_sigma=vocoder_model.sigma,
                )
    _ENGINE_CACHE[key] = engine
    return engine


# -----------------------------------------------------------------------------
# Model loading + caches (parity: larynx/__init__.py:290-508)

_TTS_MODEL_CACHE: typing.Dict[str, TextToSpeechModel] = {}


def get_tts_model(
    name: str = "",
    lang: str = "en-us",
    backend: typing.Optional[InferenceBackend] = None,
    use_cuda: bool = False,
    half: bool = False,
    url_format: str = DEFAULT_VOICE_URL_FORMAT,
    custom_voices_dir: typing.Optional[typing.Union[str, Path]] = None,
    no_download: bool = False,
    audio_settings_overrides: typing.Optional[
        typing.Dict[str, typing.Any]
    ] = None,
) -> typing.Optional[TextToSpeechModel]:
    resolved_name = resolve_voice_name(name or resolve_lang(lang))

    if not audio_settings_overrides:  # overridden models are not cached
        maybe_model = _TTS_MODEL_CACHE.get(resolved_name)
        if maybe_model is not None:
            return maybe_model

    model_dir: typing.Optional[Path] = None
    try:
        voice_lang, voice_name, voice_model_type = split_voice_name(resolved_name)
    except ValueError:
        return None
    voice_dir_name = f"{voice_name}-{voice_model_type}"

    voices_dirs = get_voices_dirs(custom_voices_dir)
    for voices_dir in voices_dirs:
        maybe_dir = voices_dir / voice_lang / voice_dir_name
        _LOGGER.debug("Checking %s for voice %s", maybe_dir, resolved_name)
        if valid_voice_dir(maybe_dir):
            model_dir = maybe_dir
            break

    if model_dir is None:
        for voices_dir in voices_dirs:
            if not voices_dir.is_dir():
                continue
            for maybe_dir in voices_dir.rglob(voice_dir_name):
                if valid_voice_dir(maybe_dir):
                    model_dir = maybe_dir
                    break
            if model_dir is not None:
                break

    if model_dir is None and not no_download:
        url_voice = get_voice_download_name(resolved_name)
        url = url_format.format(voice=url_voice)
        try:
            model_dir = download_voice(resolved_name, voices_dirs[0], url)
        except Exception:
            _LOGGER.exception("download failed for %s", resolved_name)
            return None

    if model_dir is None:
        return None
    _LOGGER.debug("Using voice at %s", model_dir)

    with open(model_dir / "phonemes.txt", "r", encoding="utf-8") as f:
        phoneme_to_id = load_phoneme_ids(f)

    import json

    with open(model_dir / "config.json", "r", encoding="utf-8") as f:
        config = json.load(f)
        audio_config = dict(config["audio"])
        if audio_settings_overrides:
            audio_config.update(audio_settings_overrides)
        audio_settings = AudioSettings(**audio_config)

    model = load_tts_model(
        voice_model_type, model_dir, backend=backend, half=half
    )
    setattr(model, "phoneme_to_id", phoneme_to_id)
    setattr(model, "audio_settings", audio_settings)

    if not audio_settings_overrides:
        _TTS_MODEL_CACHE[resolved_name] = model
    return model


def load_tts_model(
    model_type: typing.Union[str, TextToSpeechType],
    model_path: typing.Union[str, Path],
    backend: typing.Optional[InferenceBackend] = None,
    no_optimizations: bool = False,
    use_cuda: bool = False,
    half: bool = False,
) -> TextToSpeechModel:
    """Load the appropriate acoustic model (larynx/__init__.py:379-407)."""
    config = TextToSpeechModelConfig(
        model_path=Path(model_path),
        backend=backend,
        half=half,
    )
    if model_type == TextToSpeechType.GLOW_TTS:
        from larynx_tpu.glow_tts import GlowTextToSpeech

        return GlowTextToSpeech(config)

    if model_type == TextToSpeechType.TACOTRON2:
        # declared-only in the reference (larynx/__init__.py:379-407 has
        # no branch for it); fully implemented here
        from larynx_tpu.tacotron2 import Tacotron2TextToSpeech

        return Tacotron2TextToSpeech(config)

    raise ValueError(f"Unknown text to speech model type: {model_type}")


_VOCODER_MODEL_CACHE: typing.Dict[str, VocoderModel] = {}


def get_vocoder_model(
    name_or_quality: typing.Union[str, VocoderQuality] = VocoderQuality.HIGH,
    backend: typing.Optional[InferenceBackend] = None,
    use_cuda: bool = False,
    half: bool = False,
    denoiser_strength: float = 0.0,
    url_format: str = DEFAULT_VOICE_URL_FORMAT,
    custom_voices_dir: typing.Optional[typing.Union[str, Path]] = None,
    no_download: bool = False,
) -> typing.Optional[VocoderModel]:
    quality_key = (
        name_or_quality.value
        if isinstance(name_or_quality, VocoderQuality)
        else name_or_quality
    )
    maybe_model = _VOCODER_MODEL_CACHE.get(quality_key)
    if maybe_model is not None:
        return maybe_model

    if quality_key == VocoderType.GRIFFIN_LIM.value:
        model = load_vocoder_model(VocoderType.GRIFFIN_LIM, "")
        _VOCODER_MODEL_CACHE[quality_key] = model
        return model

    resolved = VOCODER_QUALITY.get(quality_key)
    if resolved is None:
        # dash-form aliases from the reference VOCODERS data file
        # ("hifi_gan-universal_large", "waveglow") advertised by --list
        alias = VOCODER_ALIASES.get(quality_key, quality_key)
        resolved = alias if "/" in alias else alias.replace("-", "/", 1)
    if "/" not in resolved:
        raise ValueError(
            f"Unknown vocoder {name_or_quality!r} (expected high/medium/"
            f"low, griffin_lim, or <model_type>/<model_name>)"
        )
    model_type, model_name = resolved.split("/", maxsplit=1)

    model_dir: typing.Optional[Path] = None
    voices_dirs = get_voices_dirs(custom_voices_dir)
    for voices_dir in voices_dirs:
        maybe_dir = voices_dir / model_type / model_name
        _LOGGER.debug("Checking %s for vocoder %s", maybe_dir, quality_key)
        if valid_voice_dir(maybe_dir):
            model_dir = maybe_dir
            break

    if model_dir is None and not no_download:
        # reference uses underscore join here (larynx/__init__.py:449)
        url = url_format.format(voice=f"{model_type}_{model_name}")
        try:
            model_dir = download_voice(model_name, voices_dirs[0], url)
        except Exception:
            _LOGGER.exception("download failed for vocoder %s", model_name)
            return None

    if model_dir is None:
        return None
    _LOGGER.debug("Using vocoder at %s", model_dir)

    model = load_vocoder_model(
        VocoderType.WAVEGLOW
        if model_type == VocoderType.WAVEGLOW.value
        else VocoderType.HIFI_GAN,
        model_dir,
        backend=backend,
        half=half,
        denoiser_strength=denoiser_strength,
    )
    _VOCODER_MODEL_CACHE[quality_key] = model
    return model


def load_vocoder_model(
    model_type: typing.Union[str, VocoderType],
    model_path: typing.Union[str, Path],
    backend: typing.Optional[InferenceBackend] = None,
    no_optimizations: bool = False,
    use_cuda: bool = False,
    half: bool = False,
    denoiser_strength: float = 0.0,
    executor: typing.Optional[Executor] = None,
) -> VocoderModel:
    """Load the appropriate vocoder (larynx/__init__.py:472-508)."""
    config = VocoderModelConfig(
        model_path=Path(model_path),
        backend=backend,
        half=half,
        denoiser_strength=denoiser_strength,
    )
    if model_type == VocoderType.GRIFFIN_LIM:
        from larynx_tpu.griffin_lim import GriffinLimVocoder

        return GriffinLimVocoder(config)
    if model_type == VocoderType.HIFI_GAN:
        from larynx_tpu.hifi_gan import HiFiGanVocoder

        return HiFiGanVocoder(config, executor=executor)
    if model_type == VocoderType.WAVEGLOW:
        # the reference declares this type but never implemented a loader
        # (larynx/__init__.py:498-508); here it works
        from larynx_tpu.waveglow import WaveGlowVocoder

        return WaveGlowVocoder(config)

    raise ValueError(f"Unknown vocoder model type: {model_type}")
