#!/usr/bin/env python3
"""Benchmark: real-time factor of the full synthesis pipeline.

Mirrors the reference methodology (scripts/benchmark-voices.sh: per-language
pangram, 1 warm-up + 3 timed runs; RTF = synth-time / audio-duration, lower
is better).  Default run = the headline config: GlowTTS harvard dims +
HiFi-GAN universal_large geometry ("high" quality), batch 8, float32 with
the fused Pallas MRF kernels.  Weights are random (no released checkpoints
ship in this environment) — RTF depends only on shapes/FLOPs, not weight
values; ``length_scale`` is set so durations match real voices.

Prints ONE JSON line:
  {"metric": "...", "value": RTF, "unit": "...", "vs_baseline": N}
vs_baseline = reference_RTF / our_RTF against the published i7-8750H
numbers (BASELINE.md: high 0.25, medium 0.06, low 0.05).

Flags: --half (bfloat16), --quality {high,medium,low,griffin_lim,waveglow},
--batch N, --workload {pangram,server,book,ssml,stream,tacotron2}, --profile
(jax.profiler trace).  The stream workload also reports
time-to-first-audio p50/p95 (reference TTFA logging:
larynx/__main__.py:287,318-326).
"""

import json
import sys
import time

import numpy as np

import jax

from larynx_tpu.audio import AudioSettings
from larynx_tpu.models.glow_tts import GlowTTSConfig
from larynx_tpu.models.glow_tts.model import init_params as glow_init
from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan.model import init_params as hifi_init
from larynx_tpu.runtime.engine import SynthesisEngine
from larynx_tpu.text.frontend import sentences
from larynx_tpu.text.ids import phonemes_to_ids

# waveglow has no reference number (the type is declared but has no loader,
# larynx/__init__.py:498-508); it serves the "high"-quality role, so its
# vs_baseline is computed against the high-quality reference RTF
BASELINES = {
    "high": 0.25, "medium": 0.06, "low": 0.05, "griffin_lim": 0.05,
    "waveglow": 0.25,
}

VOCODER_GEOMETRY = {
    # quality -> HiFiGanConfig kwargs (the released vocoder geometries)
    "high": dict(),  # universal_large defaults
    "medium": dict(upsample_initial_channel=128),  # vctk_medium
    "low": dict(  # vctk_small
        resblock="2",
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
    ),
}

# 46-symbol en-us voice inventory (local/en-us/harvard-glow_tts/phonemes.txt)
PHONEME_TABLE = {
    "_": 0, "|": 1, "‖": 2, "#": 3, "ˈ": 4, "ˌ": 5, "aɪ": 6, "aʊ": 7,
    "b": 8, "d": 9, "d͡ʒ": 10, "eɪ": 11, "f": 12, "h": 13, "i": 14,
    "j": 15, "k": 16, "l": 17, "m": 18, "n": 19, "oʊ": 20, "p": 21,
    "s": 22, "t": 23, "t͡ʃ": 24, "u": 25, "v": 26, "w": 27, "z": 28,
    "æ": 29, "ð": 30, "ŋ": 31, "ɑ": 32, "ɔ": 33, "ɔɪ": 34, "ə": 35,
    "ɚ": 36, "ɛ": 37, "ɡ": 38, "ɪ": 39, "ɹ": 40, "ʃ": 41, "ʊ": 42,
    "ʌ": 43, "ʒ": 44, "θ": 45,
}

PANGRAM = (
    "The beige hue on the waters of the loch impressed all, including the "
    "French queen, before she heard that symphony again, just as young "
    "Arthur wanted."
)

LENGTH_SCALE = 6.0  # random weights emit ~1 frame/id; real voices ~6


def _flag(name, default=None):
    if name in sys.argv:
        idx = sys.argv.index(name)
        if idx + 1 < len(sys.argv):
            return sys.argv[idx + 1]
    return default


def build_engine(quality: str, half: bool) -> SynthesisEngine:
    glow_cfg = GlowTTSConfig()
    audio_settings = AudioSettings(
        signal_norm=True, max_norm=1.0, symmetric_norm=True, clip_norm=True
    )
    key = jax.random.PRNGKey(0)
    glow_params = glow_init(key, glow_cfg)

    if quality == "griffin_lim":
        return SynthesisEngine(
            glow_params, glow_cfg, audio_settings,
            vocoder_kind="griffin_lim", half=half, seed=1234,
        )
    if quality == "waveglow":
        from larynx_tpu.models.waveglow import WaveGlowConfig
        from larynx_tpu.models.waveglow import model as wg_model

        wg_cfg = WaveGlowConfig()  # NVIDIA wn_256 geometry (local/waveglow)
        return SynthesisEngine(
            glow_params, glow_cfg, audio_settings,
            vocoder_kind="waveglow",
            vocoder_params=wg_model.init_params(
                jax.random.fold_in(key, 2), wg_cfg
            ),
            vocoder_cfg=wg_cfg,
            half=half,
            seed=1234,
        )
    hifi_cfg = HiFiGanConfig(**VOCODER_GEOMETRY[quality])
    return SynthesisEngine(
        glow_params, glow_cfg, audio_settings,
        vocoder_kind="hifi_gan",
        vocoder_params=hifi_init(jax.random.fold_in(key, 1), hifi_cfg),
        vocoder_cfg=hifi_cfg,
        half=half,
        seed=1234,
    )


def text_ids():
    out = []
    for sent in sentences(PANGRAM, lang="en-us"):
        word_phonemes = [w.phonemes for w in sent if w.phonemes]
        out.append(
            np.asarray(phonemes_to_ids(word_phonemes, PHONEME_TABLE), dtype=np.int64)
        )
    return out


def run_pangram(engine, batch_size, denoiser):
    batch = (text_ids() * batch_size)[:batch_size]

    def run_once():
        audios = engine.synthesize_batch(
            batch, length_scale=LENGTH_SCALE, denoiser_strength=denoiser
        )
        return sum(a.shape[-1] for a in audios) / engine.audio_settings.sample_rate

    return run_once


def run_server(engine, n_requests, denoiser, latencies_out):
    """32-concurrent-request workload through the coalescing scheduler."""
    import threading

    from larynx_tpu.runtime.scheduler import BatchScheduler

    ids = text_ids()[0]

    def run_once():
        scheduler = BatchScheduler(max_batch=8, max_wait_ms=30.0)
        futures = []
        barrier = threading.Barrier(n_requests)
        lock = threading.Lock()

        def request():
            barrier.wait()
            t0 = time.perf_counter()
            future = scheduler.submit(
                engine, ids, length_scale=LENGTH_SCALE,
                denoiser_strength=denoiser,
            )
            with lock:
                futures.append((future, t0))

        threads = [threading.Thread(target=request) for _ in range(n_requests)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        total = 0
        for future, t0 in list(futures):
            total += future.result().shape[-1]
            latencies_out.append(time.perf_counter() - t0)
        scheduler.shutdown()
        return total / engine.audio_settings.sample_rate

    return run_once


def run_stream(engine, denoiser, ttfa_out):
    """Streaming TTFA workload: one LONG utterance through
    synthesize_stream; records time-to-first-audio per run (the
    reference logged TTFA at larynx/__main__.py:287,318-326)."""
    ids = np.concatenate(text_ids() * 8)  # ~1k phonemes, ~4.5 min audio

    def run_once():
        t0 = time.perf_counter()
        total = 0
        first = None
        for chunk in engine.synthesize_stream(
            ids, length_scale=LENGTH_SCALE, denoiser_strength=denoiser,
            chunk_frames=64,
        ):
            if first is None:
                first = time.perf_counter() - t0
            total += chunk.shape[-1]
        ttfa_out.append(first)
        return total / engine.audio_settings.sample_rate

    return run_once


def _make_voice_dirs(quality: str):
    """Synthetic voice dirs (random weights) for full-pipeline workloads.

    Uses the shipped reference phoneme inventories when mounted; voices are
    en-us/de-de/sw to exercise multilingual SSML switching."""
    import json
    import tempfile
    from pathlib import Path

    from larynx_tpu.convert.native import save_params
    from larynx_tpu.models.glow_tts import config_from_voice_json
    from larynx_tpu.models.glow_tts.model import init_params as gi
    from larynx_tpu.models.hifi_gan.model import init_params as hi

    root = Path(tempfile.mkdtemp(prefix="bench_voices_"))
    reference = Path("/root/reference/local")
    langs = {
        "en-us": "bench_en",
        "de-de": "bench_de",
        "sw": "bench_sw",
    }
    ref_tables = {
        "en-us": reference / "en-us/harvard-glow_tts/phonemes.txt",
        "de-de": reference / "de-de/thorsten-glow_tts/phonemes.txt",
        "sw": reference / "sw/biblia_takatifu-glow_tts/phonemes.txt",
    }
    voice_config = {
        "audio": {
            "sample_rate": 22050, "mel_channels": 80, "filter_length": 1024,
            "hop_length": 256, "win_length": 1024, "mel_fmin": 0.0,
            "mel_fmax": 8000.0, "ref_level_db": 20.0, "spec_gain": 1.0,
            "signal_norm": True, "min_level_db": -100.0, "max_norm": 1.0,
            "clip_norm": True, "symmetric_norm": True,
            "do_dynamic_range_compression": True, "convert_db_to_amp": True,
        },
        "model": {"num_symbols": 64},  # superset of the inventories
    }
    for lang, name in langs.items():
        table_path = ref_tables[lang]
        voice_dir = root / lang / f"{name}-glow_tts"
        voice_dir.mkdir(parents=True)
        json.dump(voice_config, open(voice_dir / "config.json", "w"))
        if table_path.is_file():
            (voice_dir / "phonemes.txt").write_text(
                table_path.read_text(encoding="utf-8"), encoding="utf-8"
            )
        else:
            (voice_dir / "phonemes.txt").write_text(
                "\n".join(f"{i} {p}" for p, i in PHONEME_TABLE.items())
            )
        save_params(
            voice_dir / "generator.npz",
            gi(jax.random.PRNGKey(0), config_from_voice_json(voice_config)),
        )
    voc_geo = {"high": "universal_large", "medium": "vctk_medium", "low": "vctk_small"}
    voc_dir = root / "hifi_gan" / voc_geo.get(quality, "universal_large")
    voc_dir.mkdir(parents=True)
    voc_config = {
        "audio": {"num_mels": 80, "sampling_rate": 22050},
        "model": VOCODER_GEOMETRY.get(quality, {})
        and {
            k: list(v) if isinstance(v, tuple) else v
            for k, v in VOCODER_GEOMETRY[quality].items()
        },
    }
    json.dump(voc_config, open(voc_dir / "config.json", "w"))
    hcfg = HiFiGanConfig(**VOCODER_GEOMETRY.get(quality, {}))
    save_params(
        voc_dir / "generator.npz", hi(jax.random.PRNGKey(1), hcfg)
    )
    return root


def _add_tacotron2_voice(root):
    """Stage an NVIDIA-dim tacotron2 voice into a bench voices dir.

    gate_threshold > 1 forces the decode to its step cap so random
    weights give a deterministic frame count (the gate of an untrained
    model is noise); 800 steps ≈ 9.3 s of audio per sentence."""
    import json
    from pathlib import Path

    from larynx_tpu.convert.native import save_params
    from larynx_tpu.models.tacotron2 import (
        init_params as t2_init,
        tacotron2_config_from_voice_json,
    )

    table = Path(root) / "en-us" / "bench_en-glow_tts" / "phonemes.txt"
    n_symbols = (
        max(
            int(line.split()[0])
            for line in table.read_text(encoding="utf-8").splitlines()
            if line.strip()
        )
        + 1
    )
    voice_config = {
        "audio": {
            "sample_rate": 22050, "mel_channels": 80, "filter_length": 1024,
            "hop_length": 256, "win_length": 1024, "mel_fmin": 0.0,
            "mel_fmax": 8000.0,
        },
        "model": {
            "num_symbols": n_symbols,
            "max_decoder_steps": 800,
            "gate_threshold": 1.01,
        },
    }
    voice_dir = Path(root) / "en-us" / "bench_t2-tacotron2"
    voice_dir.mkdir(parents=True)
    json.dump(voice_config, open(voice_dir / "config.json", "w"))
    (voice_dir / "phonemes.txt").write_text(
        table.read_text(encoding="utf-8"), encoding="utf-8"
    )
    save_params(
        voice_dir / "generator.npz",
        t2_init(
            jax.random.PRNGKey(2),
            tacotron2_config_from_voice_json(voice_config),
        ),
    )


def run_tacotron2(voices_dir, quality, denoiser):
    """Second acoustic family (sequential attention decode) through the
    full pipeline.  The reference declares TACOTRON2 but never shipped
    it (larynx/constants.py:22), so vs_baseline uses the high-quality
    reference RTF."""
    import larynx_tpu

    def run_once():
        total = 0
        for result in larynx_tpu.text_to_speech(
            PANGRAM,
            voice_or_lang="en-us_bench_t2-tacotron2",
            vocoder_or_quality=quality,
            custom_voices_dir=voices_dir,
            denoiser_strength=denoiser,
            half="--half" in sys.argv,
        ):
            total += result.audio.shape[-1]
        return total / 22050

    return run_once


def run_book(voices_dir, quality, denoiser):
    """Long-text chapter with sentence splitting (BASELINE config 3)."""
    import larynx_tpu

    chapter = " ".join([PANGRAM] * 16)

    def run_once():
        total = 0
        for result in larynx_tpu.text_to_speech(
            chapter,
            voice_or_lang="en-us_bench_en-glow_tts",
            vocoder_or_quality=quality,
            custom_voices_dir=voices_dir,
            tts_settings={"length_scale": LENGTH_SCALE},
            denoiser_strength=denoiser,
            half="--half" in sys.argv,
        ):
            total += result.audio.shape[-1]
        return total / 22050

    return run_once


def run_ssml(voices_dir, quality, denoiser):
    """Multilingual SSML voice switching + breaks (BASELINE config 4)."""
    import larynx_tpu

    markup = """<speak>
      <voice name="en-us_bench_en-glow_tts">The beige hue on the waters of
      the loch impressed all. Just as young Arthur wanted.</voice>
      <break time="300ms"/>
      <voice name="de-de_bench_de-glow_tts"><s lang="de">Falsches Üben von
      Xylophonmusik quält jeden größeren Zwerg.</s></voice>
      <voice name="sw_bench_sw-glow_tts"><s lang="sw">Gari langu
      linaloangama limejaa na mikunga.</s></voice>
      <voice name="en-us_bench_en-glow_tts">Before she heard that symphony
      again. Including the French queen.</voice>
    </speak>"""

    def run_once():
        total = 0
        for result in larynx_tpu.text_to_speech(
            markup,
            voice_or_lang="en-us_bench_en-glow_tts",
            vocoder_or_quality=quality,
            ssml=True,
            custom_voices_dir=voices_dir,
            tts_settings={"length_scale": LENGTH_SCALE},
            denoiser_strength=denoiser,
            half="--half" in sys.argv,
            # batch the same-voice sentences that straddle the de/sw block
            interleaved_batching=True,
        ):
            total += result.audio.shape[-1]
        return total / 22050

    return run_once


def main() -> None:
    half = "--half" in sys.argv
    quality = _flag("--quality", "high")
    batch = int(_flag("--batch", "8"))
    workload = _flag("--workload", "pangram")
    denoiser = 0.0 if quality == "griffin_lim" else 0.005

    latencies: list = []
    if workload in ("book", "ssml", "tacotron2"):
        voices_dir = _make_voice_dirs(quality)
        if workload == "tacotron2":
            _add_tacotron2_voice(voices_dir)
            runner = run_tacotron2
        else:
            runner = run_book if workload == "book" else run_ssml
        run_once = runner(voices_dir, quality, denoiser)
        metric = f"rtf_{quality}_{workload}"
        engine = None
    elif workload == "server":
        engine = build_engine(quality, half)
        n_requests = batch if batch > 8 else 32
        run_once = run_server(engine, n_requests, denoiser, latencies)
        metric = f"rtf_{quality}_server{n_requests}"
    elif workload == "stream":
        engine = build_engine(quality, half)
        ttfa: list = []
        run_once = run_stream(engine, denoiser, ttfa)
        metric = f"rtf_{quality}_stream"
    else:
        engine = build_engine(quality, half)
        run_once = run_pangram(engine, batch, denoiser)
        metric = f"rtf_{quality}_batch{batch}"

    t0 = time.perf_counter()
    audio_sec = run_once()  # warm-up (compilation)
    warmup_time = time.perf_counter() - t0

    profile_dir = None
    if "--profile" in sys.argv:
        profile_dir = "/tmp/larynx_tpu_profile"
        try:
            jax.profiler.start_trace(profile_dir)
        except Exception:
            profile_dir = None

    times = []
    for _ in range(5):  # median of 5: the remote-TPU tunnel has rare 2-4x
        t0 = time.perf_counter()  # latency outliers that poison a median of 3
        audio_sec = run_once()
        times.append(time.perf_counter() - t0)

    if profile_dir:
        try:
            jax.profiler.stop_trace()
            print(f"# profiler trace written to {profile_dir}", file=sys.stderr)
        except Exception:
            pass

    synth_time = float(np.median(times))
    rtf = synth_time / audio_sec
    run_rtfs = [round(t / audio_sec, 6) for t in times]
    result = {
        "metric": metric,
        "value": round(rtf, 6),
        "unit": "synth_sec_per_audio_sec",
        "vs_baseline": round(BASELINES.get(quality, 0.25) / rtf, 2),
        # per-trial RTFs: the tunnel has ±20% run-to-run variance, so the
        # spread distinguishes a real regression from a congested window
        "value_runs": run_rtfs,
        "value_spread": round(max(run_rtfs) - min(run_rtfs), 6),
        "audio_sec_per_run": round(audio_sec, 2),
        "synth_sec_per_run": round(synth_time, 4),
        "warmup_sec": round(warmup_time, 2),
        "device": str(jax.devices()[0]),
        "half": half,
        "batch": batch,
    }
    if latencies:
        timed = latencies[len(latencies) // 4 :]  # skip warm-up run's share
        result["p50_request_latency_sec"] = round(
            float(np.percentile(timed, 50)), 4
        )
        result["p95_request_latency_sec"] = round(
            float(np.percentile(timed, 95)), 4
        )
    if workload == "stream" and ttfa:
        timed = ttfa[1:]  # first run includes compilation
        result["ttfa_p50_sec"] = round(float(np.percentile(timed, 50)), 4)
        result["ttfa_p95_sec"] = round(float(np.percentile(timed, 95)), 4)
        result["ttfa_warmup_sec"] = round(ttfa[0], 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
