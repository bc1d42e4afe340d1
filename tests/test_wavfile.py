"""WAV I/O round-trip tests."""

import io

import numpy as np
import pytest

from larynx_tpu.io import wavfile


@pytest.mark.parametrize(
    "dtype",
    [np.uint8, np.int16, np.int32, np.float32, np.float64],
)
def test_roundtrip_mono(dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        data = rng.uniform(-1, 1, 1000).astype(dtype)
    elif dtype == np.uint8:
        data = rng.integers(0, 255, 1000).astype(dtype)
    else:
        info = np.iinfo(dtype)
        data = rng.integers(info.min, info.max, 1000).astype(dtype)

    buf = io.BytesIO()
    wavfile.write(buf, 22050, data)
    buf.seek(0)
    rate, out = wavfile.read(buf)
    assert rate == 22050
    assert out.dtype == data.dtype
    np.testing.assert_array_equal(out, data)


def test_read_24bit_left_justified(tmp_path):
    """24-bit PCM reads as FULL-RANGE int32 (lowest byte zero), matching
    scipy / the reference's vendored reader — regression: a >>8 shift
    attenuated 24-bit training audio 256x."""
    import struct

    samples = [8388607, -8388608, 0, 1, -1]  # full-scale 24-bit values
    payload = b"".join(
        struct.pack("<i", s << 8)[1:] for s in samples  # 3 LE bytes each
    )
    header = (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 22050, 22050 * 3, 3, 24)
        + b"data" + struct.pack("<I", len(payload))
    )
    path = tmp_path / "s24.wav"
    path.write_bytes(header + payload)

    rate, data = wavfile.read(path)
    assert rate == 22050 and data.dtype == np.int32
    np.testing.assert_array_equal(data, [s << 8 for s in samples])
    # full-scale 24-bit -> ~full-scale float through the training loader
    from larynx_tpu.models.glow_tts.data import _pcm_to_float

    f = _pcm_to_float(data)
    assert f.max() > 0.99 and f.min() < -0.99


def test_roundtrip_stereo():
    rng = np.random.default_rng(1)
    data = rng.integers(-30000, 30000, (500, 2)).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, 48000, data)
    buf.seek(0)
    rate, out = wavfile.read(buf)
    assert rate == 48000
    assert out.shape == (500, 2)
    np.testing.assert_array_equal(out, data)


def test_reads_reference_sample_wavs(reference_dir):
    """Read golden WAVs shipped with the reference voices."""
    wavs = sorted(reference_dir.glob("local/en-us/*/samples/*.wav"))
    if not wavs:
        pytest.skip("no sample wavs in reference")
    rate, data = wavfile.read(wavs[0])
    assert rate > 0
    assert data.size > rate  # at least one second of audio


def test_wav_bytes_header():
    data = np.zeros(100, dtype=np.int16)
    blob = wavfile.wav_bytes(22050, data)
    assert blob[:4] == b"RIFF"
    assert blob[8:12] == b"WAVE"
