"""Griffin-Lim vocoder parity vs the reference numpy implementation."""

import importlib.util
import sys

import numpy as np

import jax.numpy as jnp

from larynx_tpu.audio import mel_basis
from larynx_tpu.models import griffin_lim as gl


def _load_ref(reference_dir, name):
    """Load reference larynx modules with their intra-package imports."""
    sys.path.insert(0, str(reference_dir))
    try:
        spec = importlib.util.spec_from_file_location(
            name, reference_dir / "larynx" / f"{name.split('.')[-1]}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(str(reference_dir))


def test_griffin_lim_parity_fixed_phase(reference_dir):
    """With identical initial phase and 3 iterations the loop is
    deterministic; outputs must match the reference (larynx/griffin_lim.py)."""
    ref_audio = _load_ref(reference_dir, "audio")

    rng = np.random.default_rng(11)
    t_frames = 40
    mels = rng.uniform(-4.0, 2.0, size=(1, 80, t_frames)).astype(np.float32)

    basis = mel_basis(22050, 1024, 80, 0.0, 8000.0)

    # Reference pipeline (larynx/griffin_lim.py:40-76) with pinned phase
    mel_decompress = ref_audio.dynamic_range_decompression(mels).squeeze(0)
    spec = np.matmul(mel_decompress.transpose(), basis)
    spec = np.expand_dims(spec.transpose(), 0) * 1000.0
    magnitudes = spec[:, :, :-1]

    phase = (
        np.angle(np.exp(2j * np.pi * rng.random(magnitudes.shape)))
        .astype(np.float32)
    )
    signal_ref = ref_audio.inverse(magnitudes, phase)
    for _ in range(3):
        _, angles = ref_audio.transform(signal_ref)
        signal_ref = ref_audio.inverse(magnitudes, angles)

    # Ours: same magnitudes path + same initial phase
    signal = np.asarray(
        gl.mels_to_audio(
            jnp.asarray(mels),
            jnp.asarray(basis),
            initial_phase=jnp.asarray(phase),
            n_iters=3,
        )
    )
    assert signal.shape == signal_ref.shape
    np.testing.assert_allclose(signal, signal_ref, rtol=1e-2, atol=2e-2)


def test_fast_griffin_lim_converges_better():
    """FGLA (momentum) must reach a lower spectral-convergence error than
    plain Griffin-Lim at the same iteration count (Perraudin et al.)."""
    import jax

    import larynx_tpu.dsp.stft as dsp

    # target magnitudes from a real signal so a consistent solution exists
    rng = np.random.default_rng(3)
    t = np.linspace(0, 1, 22050, dtype=np.float32)
    sig = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 660 * t + 1.0)
        + 0.05 * rng.standard_normal(t.shape).astype(np.float32)
    )
    mag, _ = dsp.stft_magnitude_phase(jnp.asarray(sig)[None], 1024, 256)

    def sc_error(audio):
        # gain-invariant spectral convergence: the ISTFT's un-normalized
        # overlap-add applies a uniform window gain that GL is indifferent
        # to (audio is peak-normalized downstream)
        m, _ = dsp.stft_magnitude_phase(audio, 1024, 256)
        n = min(m.shape[-1], mag.shape[-1])
        m, ref = m[..., :n], mag[..., :n]
        alpha = jnp.vdot(m, ref) / jnp.vdot(m, m)
        return float(jnp.linalg.norm(alpha * m - ref) / jnp.linalg.norm(ref))

    key = jax.random.PRNGKey(0)
    plain = dsp.griffin_lim(mag, key, 1024, 256, 30, momentum=0.0)
    fast = dsp.griffin_lim(mag, key, 1024, 256, 30, momentum=0.99)
    e_plain, e_fast = sc_error(plain), sc_error(fast)
    assert np.isfinite(e_fast)
    assert e_fast < e_plain * 0.9, (e_plain, e_fast)


def test_griffin_lim_produces_audio():
    """Sanity: random-key path returns finite, non-silent audio."""
    import jax

    rng = np.random.default_rng(12)
    mels = rng.uniform(-4.0, 1.0, size=(1, 80, 30)).astype(np.float32)
    basis = mel_basis(22050, 1024, 80, 0.0, 8000.0)
    audio = np.asarray(
        gl.mels_to_audio(
            jnp.asarray(mels),
            jnp.asarray(basis),
            key=jax.random.PRNGKey(0),
            n_iters=10,
        )
    )
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() > 0
