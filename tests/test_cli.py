"""CLI tests: argument handling, output modes."""

import io
import sys

import numpy as np
import pytest

from larynx_tpu.io import wavfile

# reuse the synthetic voice fixture
from test_pipeline import voices_dir  # noqa: F401


def _run_cli(argv, capsysbinary=None, stdin_text=None, monkeypatch=None):
    from larynx_tpu.__main__ import main

    if stdin_text is not None and monkeypatch is not None:
        monkeypatch.setattr(
            "sys.stdin", io.TextIOWrapper(io.BytesIO(stdin_text.encode()))
        )
    main(argv)


def test_cli_wav_to_stdout(voices_dir, capsysbinary):
    import larynx_tpu

    larynx_tpu._TTS_MODEL_CACHE.clear()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    larynx_tpu._ENGINE_CACHE.clear()

    _run_cli(
        [
            "CLI test sentence.",
            "--voice",
            "en-us_test_voice-glow_tts",
            "--quality",
            "low",
            "--voices-dir",
            str(voices_dir),
            "--denoiser-strength",
            "0",
        ]
    )
    out = capsysbinary.readouterr().out
    assert out[:4] == b"RIFF"
    rate, audio = wavfile.read(io.BytesIO(out))
    assert rate == 22050
    assert audio.size > 1000


def test_cli_output_dir(voices_dir, tmp_path, capsysbinary):
    _run_cli(
        [
            "Write me to a file.",
            "--voice",
            "en-us_test_voice-glow_tts",
            "--quality",
            "low",
            "--voices-dir",
            str(voices_dir),
            "--output-dir",
            str(tmp_path),
            "--denoiser-strength",
            "0",
        ]
    )
    wavs = list(tmp_path.glob("*.wav"))
    assert len(wavs) == 1
    assert "Write_me_to_a_file" in wavs[0].name


def test_cli_csv_mode(voices_dir, tmp_path, monkeypatch, capsysbinary):
    _run_cli(
        [
            "--csv",
            "--voice",
            "en-us_test_voice-glow_tts",
            "--quality",
            "low",
            "--voices-dir",
            str(voices_dir),
            "--output-dir",
            str(tmp_path),
            "--denoiser-strength",
            "0",
        ],
        stdin_text="utt1|Hello there.\nutt2|Good bye now.\n",
        monkeypatch=monkeypatch,
    )
    names = {p.name for p in tmp_path.glob("*.wav")}
    assert names == {"utt1.wav", "utt2.wav"}


def test_cli_no_download_fails_fast(voices_dir, capsysbinary, monkeypatch):
    """--no-download must not attempt a network fetch for a missing voice
    (get_tts_model swallows download errors, so the fetch must be
    observed directly)."""
    import larynx_tpu

    larynx_tpu._TTS_MODEL_CACHE.clear()

    calls = []

    def spy(*a, **kw):  # record any fetch attempt (errors are swallowed
        calls.append(a)  # upstream, so raising would not be observable)
        raise RuntimeError("offline")

    monkeypatch.setattr(larynx_tpu, "download_voice", spy)
    with pytest.raises(AssertionError, match="Failed to load voice"):
        _run_cli(
            [
                "text",
                "--voice", "en-us_not_installed-glow_tts",
                "--voices-dir", str(voices_dir),
                "--no-download",
            ]
        )
    assert not calls, "network fetch attempted despite --no-download"


def test_cli_config_audio_overrides(voices_dir, tmp_path, capsysbinary):
    """--config JSON audio settings override the voice's config.json."""
    import json

    import larynx_tpu

    larynx_tpu._TTS_MODEL_CACHE.clear()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    larynx_tpu._ENGINE_CACHE.clear()

    cfg_path = tmp_path / "audio.json"
    json.dump({"audio": {"sample_rate": 16000}}, open(cfg_path, "w"))
    _run_cli(
        [
            "Config override test.",
            "--voice", "en-us_test_voice-glow_tts",
            "--quality", "low",
            "--voices-dir", str(voices_dir),
            "--config", str(cfg_path),
            "--denoiser-strength", "0",
        ]
    )
    out = capsysbinary.readouterr().out
    rate, audio = wavfile.read(io.BytesIO(out))
    assert rate == 16000  # overridden sample rate reaches the WAV header
    larynx_tpu._TTS_MODEL_CACHE.clear()
    larynx_tpu._ENGINE_CACHE.clear()


def test_cli_explicit_stdin_document(voices_dir, capsysbinary, monkeypatch):
    """--stdin-format document synthesizes multi-line input as ONE text
    (regression: the explicit choice was ignored without --ssml)."""
    import larynx_tpu

    larynx_tpu._TTS_MODEL_CACHE.clear()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    larynx_tpu._ENGINE_CACHE.clear()

    calls = []
    real_tts = larynx_tpu.text_to_speech

    def counting_tts(*a, **kw):
        calls.append(kw.get("text") or (a[0] if a else None))
        return real_tts(*a, **kw)

    # main() does `from larynx_tpu import text_to_speech` at call time
    monkeypatch.setattr(larynx_tpu, "text_to_speech", counting_tts)
    _run_cli(
        [
            "--voice", "en-us_test_voice-glow_tts",
            "--quality", "low",
            "--voices-dir", str(voices_dir),
            "--stdin-format", "document",
            "--denoiser-strength", "0",
        ],
        stdin_text="First line\nsecond line.\n",
        monkeypatch=monkeypatch,
    )
    out = capsysbinary.readouterr().out
    assert out[:4] == b"RIFF"
    # ONE synthesis call carrying the whole document, not one per line
    assert len(calls) == 1 and "second line" in calls[0]


def test_cli_version(capsys):
    from larynx_tpu.__main__ import get_args

    with pytest.raises(SystemExit):
        get_args(["--version"])
    out = capsys.readouterr().out.strip()
    assert out[0].isdigit()


def test_cli_list(capsys, voices_dir):
    from larynx_tpu.__main__ import get_args

    with pytest.raises(SystemExit):
        get_args(["--list", "--voices-dir", str(voices_dir)])
    out = capsys.readouterr().out
    assert "ljspeech-glow_tts" in out
    assert "hifi_gan-universal_large" in out
    # our synthetic voice is local
    assert "test_voice-glow_tts" in out


def test_cli_mark_file(voices_dir, tmp_path, capsysbinary):
    mark_file = tmp_path / "marks.txt"
    _run_cli(
        [
            '<speak>Before. <mark name="m1"/>After.</speak>',
            "--ssml",
            "--voice",
            "en-us_test_voice-glow_tts",
            "--quality",
            "low",
            "--voices-dir",
            str(voices_dir),
            "--mark-file",
            str(mark_file),
            "--denoiser-strength",
            "0",
        ]
    )
    assert mark_file.read_text().strip() == "m1"


def test_cli_stream(voices_dir, capsysbinary):
    """--stream emits raw PCM chunks (chunked low-latency path)."""
    from larynx_tpu.__main__ import main

    main(
        [
            "Streaming from the command line.",
            "--voice",
            "en-us_test_voice-glow_tts",
            "-q",
            "low",
            "--voices-dir",
            str(voices_dir),
            "--stream",
            "--stream-chunk-frames",
            "16",
        ]
    )
    data = capsysbinary.readouterr().out
    assert len(data) > 8000 and len(data) % 2 == 0
    import numpy as np

    audio = np.frombuffer(data, dtype=np.int16)
    assert np.abs(audio).max() > 0
