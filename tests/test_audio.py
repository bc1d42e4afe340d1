"""DSP unit tests: mel basis, normalization chain, STFT/ISTFT parity."""

import numpy as np
import pytest

from larynx_tpu.audio import (
    AudioSettings,
    audio_float_to_int16,
    mel_basis,
)


def test_mel_basis_matches_reference_oracle(reference_dir):
    """Our Slaney mel filter bank must equal the reference's (which is
    librosa-derived, larynx/audio.py:131-161)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_audio", reference_dir / "larynx" / "audio.py"
    )
    ref_audio = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_audio)

    ours = mel_basis(22050, 1024, 80, 0.0, 8000.0)
    theirs = ref_audio.mel_basis(22050, 1024, 80, 0.0, 8000.0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_normalize_denormalize_roundtrip():
    settings = AudioSettings(
        signal_norm=True,
        symmetric_norm=True,
        max_norm=1.0,
        clip_norm=True,
        min_level_db=-100.0,
        ref_level_db=20.0,
    )
    rng = np.random.default_rng(0)
    mel_db = rng.uniform(-80.0, 20.0, size=(80, 100)).astype(np.float32)
    norm = settings.normalize(mel_db)
    denorm = settings.denormalize(norm)
    # Values inside the clip range round-trip
    inside = (norm > -1.0) & (norm < 1.0)
    np.testing.assert_allclose(denorm[inside], mel_db[inside], atol=1e-4)


def test_normalization_matches_reference_oracle(reference_dir):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_audio", reference_dir / "larynx" / "audio.py"
    )
    ref_audio = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_audio)

    kwargs = dict(
        signal_norm=True,
        symmetric_norm=True,
        max_norm=1.0,
        clip_norm=True,
        min_level_db=-100.0,
        ref_level_db=20.0,
        spec_gain=1.0,
    )
    ours = AudioSettings(**kwargs)
    theirs = ref_audio.AudioSettings(**kwargs)

    rng = np.random.default_rng(1)
    mel = rng.uniform(-1.2, 1.2, size=(1, 80, 50)).astype(np.float32)
    # The full inference chain: denormalize -> db_to_amp -> dynrange compress
    np.testing.assert_allclose(
        ours.dynamic_range_compression(ours.db_to_amp(ours.denormalize(mel))),
        theirs.dynamic_range_compression(
            theirs.db_to_amp(theirs.denormalize(mel))
        ),
        rtol=1e-6,
    )


def test_audio_float_to_int16():
    audio = np.array([0.0, 0.5, -1.0, 1.0], dtype=np.float32)
    out = audio_float_to_int16(audio)
    assert out.dtype == np.int16
    assert out[3] == 32767
    assert out[2] == -32767


def test_stft_istft_match_reference_oracle(reference_dir):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_audio", reference_dir / "larynx" / "audio.py"
    )
    ref_audio = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_audio)

    import jax.numpy as jnp

    import larynx_tpu.dsp.stft as our_stft

    rng = np.random.default_rng(2)
    signal = rng.standard_normal(22050).astype(np.float32)

    theirs = ref_audio.stft(signal, 1024, 256)  # [n_frames, n_freq]
    ours = np.asarray(our_stft.stft(jnp.asarray(signal)[None, :], 1024, 256))
    assert ours.shape == (1, theirs.shape[1], theirs.shape[0])
    np.testing.assert_allclose(
        ours[0], theirs.T, rtol=1e-4, atol=1e-3
    )

    # ISTFT parity
    inv_theirs = ref_audio.istft(theirs, 1024, 256)
    inv_ours = np.asarray(our_stft.istft(jnp.asarray(ours), 1024, 256))[0]
    assert inv_ours.shape[0] == inv_theirs.shape[0]
    np.testing.assert_allclose(inv_ours, inv_theirs, rtol=1e-4, atol=1e-3)


def test_transform_inverse_match_reference_oracle(reference_dir):
    """Batch magnitude/phase transform + inverse (denoiser building blocks)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_audio", reference_dir / "larynx" / "audio.py"
    )
    ref_audio = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_audio)

    import jax.numpy as jnp

    import larynx_tpu.dsp.stft as our_stft

    rng = np.random.default_rng(3)
    signal = rng.standard_normal((1, 10240)).astype(np.float32)

    mag_ref, phase_ref = ref_audio.transform(signal)
    mag_ours, phase_ours = our_stft.stft_magnitude_phase(
        jnp.asarray(signal), 1024, 256
    )
    np.testing.assert_allclose(np.asarray(mag_ours), mag_ref, rtol=1e-3, atol=1e-3)

    inv_ref = ref_audio.inverse(mag_ref, phase_ref)
    inv_ours = our_stft.inverse_magnitude_phase(
        jnp.asarray(mag_ref), jnp.asarray(phase_ref), 1024, 256
    )
    np.testing.assert_allclose(
        np.asarray(inv_ours), inv_ref, rtol=1e-3, atol=1e-3
    )


def test_mel_postprocess_device_matches_host():
    import jax.numpy as jnp

    from larynx_tpu.dsp.mel import mel_postprocess

    settings = AudioSettings(
        signal_norm=True,
        symmetric_norm=True,
        max_norm=1.0,
        clip_norm=True,
        min_level_db=-100.0,
        ref_level_db=20.0,
        spec_gain=1.0,
        convert_db_to_amp=True,
        do_dynamic_range_compression=True,
    )
    rng = np.random.default_rng(4)
    mel = rng.uniform(-1.2, 1.2, size=(2, 80, 64)).astype(np.float32)

    host = settings.dynamic_range_compression(
        settings.db_to_amp(settings.denormalize(mel))
    )
    device = np.asarray(mel_postprocess(jnp.asarray(mel), settings))
    np.testing.assert_allclose(device, host, rtol=1e-5, atol=1e-6)
