"""Training-data pipeline (models/glow_tts/data.py): WAV loading across
PCM formats, mel-target extraction, batch assembly."""

import csv

import numpy as np
import pytest

from larynx_tpu.io import wavfile
from larynx_tpu.models.glow_tts.data import Dataset, _pcm_to_float


def test_pcm_to_float_all_wavfile_dtypes():
    """Every dtype the in-tree reader can return maps to [-1, 1] floats
    (regression: uint8/int32 corpora trained on ±2e9 amplitudes)."""
    f = np.sin(np.linspace(0, 40, 2000)).astype(np.float32) * 0.5
    u8 = ((f * 127) + 128).astype(np.uint8)
    i16 = (f * 32767).astype(np.int16)
    i32 = (f * 2147483647).astype(np.int32)

    for pcm in (u8, i16, i32, f):
        out = _pcm_to_float(pcm)
        assert out.dtype == np.float32
        assert np.abs(out).max() <= 1.0
        # same underlying signal up to quantization
        np.testing.assert_allclose(out, f, atol=2 / 127)


@pytest.mark.parametrize("dtype", ["uint8", "int16", "int32", "float64"])
def test_dataset_example_consistent_across_pcm_formats(tmp_path, dtype):
    """The same audio stored in different PCM containers must yield the
    same mel targets (within quantization noise).  The reference file is
    float32, so every parametrization compares across DIFFERENT container
    code paths (a float32 case would compare a file against a
    byte-identical copy of itself)."""
    sr = 22050
    t = np.linspace(0, 0.4, int(sr * 0.4), dtype=np.float32)
    f = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    if dtype == "uint8":
        pcm = ((f * 127) + 128).astype(np.uint8)
    elif dtype == "int16":
        pcm = (f * 32767).astype(np.int16)
    elif dtype == "int32":
        pcm = (f * 2147483647).astype(np.int32)
    else:
        pcm = f.astype(np.float64)
    wavfile.write(wav_dir / "utt1.wav", sr, pcm)
    # float reference alongside
    wavfile.write(wav_dir / "ref.wav", sr, f)

    with open(tmp_path / "metadata.csv", "w", encoding="utf-8") as fh:
        w = csv.writer(fh, delimiter="|")
        w.writerow(["utt1", "Hello world."])
        w.writerow(["ref", "Hello world."])

    from larynx_tpu.audio import AudioSettings

    phonemes = {p: i for i, p in enumerate("_#‖|aehlowdrˈ ")}
    ds = Dataset(
        tmp_path / "metadata.csv", wav_dir, phoneme_to_id=phonemes,
        settings=AudioSettings(), lang="en-us",
    )
    ex = ds.example(0)
    ref = ds.example(1)
    assert ex is not None and ref is not None
    ids, mel = ex
    _, mel_ref = ref
    assert ids.dtype == np.int32 and len(ids) > 0
    assert mel.shape == mel_ref.shape
    assert np.isfinite(mel).all()
    # strong tone bins agree; quieter bins approach the quantization noise
    # floor where the log-mel legitimately differs (uint8 SNR is ~48 dB)
    loud = mel_ref > mel_ref.max() - 2.0
    assert loud.any()
    assert np.abs(mel - mel_ref)[loud].max() < 0.35, (
        np.abs(mel - mel_ref)[loud].max()
    )
