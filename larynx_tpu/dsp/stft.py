"""Batched STFT / ISTFT as jittable JAX functions.

These reproduce the reference's exact (non-centered, Hann-windowed,
window-on-both-sides, un-normalized overlap-add) framing semantics
(larynx/audio.py:232-306) so the HiFi-GAN denoiser and Griffin-Lim produce
the same waveforms — but run batched on TPU with static shapes instead of
per-frame Python loops on the host.

Conventions:
  * signals are [B, T] float32
  * spectra are [B, n_freq, n_frames] (n_freq = fft_size//2 + 1)
  * n_frames = ceil((T - fft_size) / hop) (frames starting past T-fft_size
    are dropped, matching ``range(0, len(x) - fft_size, hop)``)
"""

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np


def _use_matmul_dft() -> bool:
    """XLA's TPU FFT lowering is slow; a fixed-size DFT as two MXU matmuls
    is much faster there.  CPU keeps the numpy-exact rfft path."""
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=4)
def _dft_matrices(fft_size: int):
    """Forward rFFT as matmul: X = frames @ (C - i S).

    C[n, k] = cos(2*pi*k*n/N), S[n, k] = sin(2*pi*k*n/N); k in [0, N/2].
    """
    n = np.arange(fft_size)[:, None]
    k = np.arange(fft_size // 2 + 1)[None, :]
    angle = 2.0 * np.pi * n * k / fft_size
    # cache numpy (not jnp): jnp constants created inside a jit trace are
    # tracers and must not leak through the cache
    return (
        np.cos(angle).astype(np.float32),
        np.sin(angle).astype(np.float32),
    )


@functools.lru_cache(maxsize=4)
def _idft_matrices(fft_size: int):
    """Inverse rFFT as matmul: x = Re @ A + Im @ B.

    Hermitian symmetry: x[n] = (1/N)(X0 + (-1)^n X_{N/2}
    + sum_k 2 (Re_k cos - Im_k sin)).
    """
    n_freq = fft_size // 2 + 1
    k = np.arange(n_freq)[:, None]
    n = np.arange(fft_size)[None, :]
    angle = 2.0 * np.pi * k * n / fft_size
    scale = np.full((n_freq, 1), 2.0)
    scale[0] = 1.0
    scale[-1] = 1.0
    a = scale * np.cos(angle) / fft_size
    b = -scale * np.sin(angle) / fft_size
    return a.astype(np.float32), b.astype(np.float32)


def hann_window(fft_size: int) -> np.ndarray:
    """numpy.hanning-compatible periodic-ish Hann (N points, endpoints 0)."""
    return np.hanning(fft_size).astype(np.float32)


def num_frames(n_samples: int, fft_size: int, hop: int) -> int:
    """Frame count for the reference's framing loop."""
    span = n_samples - fft_size
    if span <= 0:
        return 0
    return -(-span // hop)  # ceil


def frame_signal(x: jnp.ndarray, fft_size: int, hop: int) -> jnp.ndarray:
    """[B, T] -> [B, n_frames, fft_size].

    When hop divides fft_size the frames come from fft/hop shifted
    contiguous reshapes (bandwidth-optimal slices, no gather — XLA lowers
    the index-array form to a slow gather on TPU)."""
    n = num_frames(x.shape[-1], fft_size, hop)
    if fft_size % hop == 0 and n > 0:
        ratio = fft_size // hop
        b = x.shape[0]
        segs = [
            jax.lax.slice_in_dim(
                x, j * hop, j * hop + n * hop, axis=-1
            ).reshape(b, n, hop)
            for j in range(ratio)
        ]
        return jnp.concatenate(segs, axis=-1)
    starts = np.arange(n, dtype=np.int32) * hop
    idx = starts[:, None] + np.arange(fft_size, dtype=np.int32)[None, :]
    return x[..., idx]


def _stft_ri_frames(x: jnp.ndarray, fft_size: int, hop: int):
    """(real, imag) STFT halves, each [B, n_frames, n_freq] (frames-major).

    Frames-major is the hot-loop layout: the DFT is a plain [.., fft] x
    [fft, n_freq] matmul with no transposes materializing in HBM.
    """
    window = jnp.asarray(hann_window(fft_size))
    frames = frame_signal(x, fft_size, hop) * window  # [B, F, fft]
    if _use_matmul_dft():
        cos_m, sin_m = _dft_matrices(fft_size)
        real = jnp.einsum(
            "bfn,nk->bfk", frames, cos_m, preferred_element_type=jnp.float32
        )
        imag = -jnp.einsum(
            "bfn,nk->bfk", frames, sin_m, preferred_element_type=jnp.float32
        )
        return real, imag
    spec = jnp.fft.rfft(frames, axis=-1)  # [B, F, n_freq]
    return spec.real, spec.imag


def _stft_ri(x: jnp.ndarray, fft_size: int, hop: int):
    """(real, imag) STFT halves, each [B, n_freq, n_frames]."""
    real, imag = _stft_ri_frames(x, fft_size, hop)
    return jnp.swapaxes(real, -1, -2), jnp.swapaxes(imag, -1, -2)


def stft(x: jnp.ndarray, fft_size: int = 1024, hop: int = 256) -> jnp.ndarray:
    """Complex STFT: [B, T] -> [B, n_freq, n_frames]."""
    real, imag = _stft_ri(x, fft_size, hop)
    return real + 1j * imag


def stft_magnitude_phase(x: jnp.ndarray, fft_size: int = 1024, hop: int = 256):
    """Batch magnitude/phase, mirroring ``transform`` (larynx/audio.py:292)."""
    real, imag = _stft_ri(x, fft_size, hop)
    return jnp.sqrt(jnp.square(real) + jnp.square(imag)), jnp.arctan2(imag, real)


def istft_overlap_add(
    frames: jnp.ndarray, fft_size: int, hop: int, out_len: int
) -> jnp.ndarray:
    """Windowed overlap-add of time-domain frames [B, F, fft] -> [B, out_len].

    Matches the reference's un-normalized synthesis (larynx/audio.py:252-269):
    the Hann window is applied again at synthesis and no COLA normalization
    is performed.
    """
    window = jnp.asarray(hann_window(fft_size))
    frames = frames * window
    b, n_frames, _ = frames.shape

    if fft_size % hop == 0 and n_frames > 0:
        # Stride trick: split each frame into fft//hop hop-sized segments and
        # accumulate shifted contiguous streams — no scatter needed.
        ratio = fft_size // hop
        segs = frames.reshape(b, n_frames, ratio, hop)
        out = jnp.zeros((b, out_len), dtype=frames.dtype)
        stream_len = n_frames * hop
        for j in range(ratio):
            stream = segs[:, :, j, :].reshape(b, stream_len)
            start = j * hop
            seg_len = min(stream_len, max(0, out_len - start))
            if seg_len <= 0:
                continue
            out = out.at[:, start : start + seg_len].add(stream[:, :seg_len])
        return out

    # General fallback: scatter-add
    starts = np.arange(n_frames, dtype=np.int32) * hop
    idx = starts[:, None] + np.arange(fft_size, dtype=np.int32)[None, :]
    out = jnp.zeros((b, out_len), dtype=frames.dtype)
    return out.at[:, idx].add(frames, mode="drop")


def _istft_ri_frames(
    real: jnp.ndarray, imag: jnp.ndarray, fft_size: int, hop: int
) -> jnp.ndarray:
    """Inverse STFT from frames-major (real, imag) [B, n_frames, n_freq]."""
    if _use_matmul_dft():
        a, b = _idft_matrices(fft_size)
        frames = jnp.einsum(
            "bfk,kn->bfn", real, a, preferred_element_type=jnp.float32
        ) + jnp.einsum(
            "bfk,kn->bfn", imag, b, preferred_element_type=jnp.float32
        )
    else:
        frames = jnp.fft.irfft(real + 1j * imag, n=fft_size, axis=-1).real
    n_frames = frames.shape[1]
    full_len = n_frames * hop + fft_size
    # The reference writes frames at range(0, full_len - fft, hop): exactly
    # n_frames' = ceil((full_len - fft)/hop) = n_frames slots — all frames.
    return istft_overlap_add(frames, fft_size, hop, full_len)


def _istft_ri(
    real: jnp.ndarray, imag: jnp.ndarray, fft_size: int, hop: int
) -> jnp.ndarray:
    """Inverse STFT from (real, imag) [B, n_freq, n_frames] -> [B, T]."""
    return _istft_ri_frames(
        jnp.swapaxes(real, -1, -2), jnp.swapaxes(imag, -1, -2), fft_size, hop
    )


def istft(
    spec: jnp.ndarray, fft_size: int = 1024, hop: int = 256
) -> jnp.ndarray:
    """Inverse STFT: complex [B, n_freq, n_frames] -> [B, T].

    Output length is ``n_frames * hop + fft_size`` with the same dropped-tail
    behavior as the reference's per-frame loop.
    """
    return _istft_ri(spec.real, spec.imag, fft_size, hop)


def inverse_magnitude_phase(
    magnitude: jnp.ndarray, phase: jnp.ndarray, fft_size: int = 1024, hop: int = 256
) -> jnp.ndarray:
    """Rebuild a waveform from magnitude+phase (larynx/audio.py:272-289)."""
    return _istft_ri(
        magnitude * jnp.cos(phase), magnitude * jnp.sin(phase), fft_size, hop
    )


def phase_project_frames(
    mag_frames: jnp.ndarray, signal: jnp.ndarray, fft_size: int, hop: int
) -> jnp.ndarray:
    """One Griffin-Lim projection with frames-major magnitudes
    [B, n_frames, n_freq] — the hot-loop form: two matmul-DFTs, zero
    transposes, and e^{i angle(X)} = X/|X| instead of arctan2/cos/sin
    (transcendentals dominate on the VPU otherwise)."""
    real, imag = _stft_ri_frames(signal, fft_size, hop)
    inv_mag = jax.lax.rsqrt(jnp.square(real) + jnp.square(imag) + 1e-12)
    return _istft_ri_frames(
        mag_frames * real * inv_mag,
        mag_frames * imag * inv_mag,
        fft_size,
        hop,
    )


def phase_project(
    magnitudes: jnp.ndarray, signal: jnp.ndarray, fft_size: int, hop: int
) -> jnp.ndarray:
    """Griffin-Lim projection, freq-major magnitudes [B, n_freq, n_frames]
    (reference layout); loops should pre-transpose and use
    :func:`phase_project_frames`."""
    return phase_project_frames(
        jnp.swapaxes(magnitudes, -1, -2), signal, fft_size, hop
    )


@functools.partial(
    jax.jit, static_argnames=("fft_size", "hop", "n_iters", "momentum")
)
def griffin_lim(
    magnitudes: jnp.ndarray,
    key: typing.Optional[jax.Array] = None,
    fft_size: int = 1024,
    hop: int = 256,
    n_iters: int = 60,
    initial_phase: typing.Optional[jnp.ndarray] = None,
    momentum: float = 0.0,
) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction, fully on device — THE shared
    implementation (the Griffin-Lim vocoder wrapper and the engine's
    vocode program both call it; do not re-inline the loop).

    ``magnitudes``: [B, n_freq, n_frames] linear magnitude.  Matches
    larynx/griffin_lim.py:66-76 (random initial phase, fixed iteration count)
    but runs as one XLA program with ``lax.fori_loop``.  Phase starts from
    ``initial_phase`` when given (parity tests) else uniformly at random
    from ``key``.

    ``momentum`` > 0 enables the Fast Griffin-Lim acceleration
    (Perraudin et al.; see PAPERS.md "Fast Griffin Lim based Waveform
    Generation"): t_{n+1} = c_n + momentum * (c_n - c_{n-1}) with
    c_n = project(t_n).  0.99 converges markedly closer to the target
    magnitudes at the same iteration count; 0.0 (default) is the
    reference's plain iteration, kept for parity.
    """
    if initial_phase is None:
        # angle(exp(2j*pi*u)) wraps into (-pi, pi]; same up to 2*pi phase
        angles = (
            2.0
            * jnp.pi
            * jax.random.uniform(key, magnitudes.shape, dtype=jnp.float32)
        )
    else:
        angles = initial_phase
    signal = inverse_magnitude_phase(magnitudes, angles, fft_size, hop)

    # the loop runs frames-major: transpose once, not per iteration
    mag_frames = jnp.swapaxes(magnitudes, -1, -2)

    if momentum:

        def fbody(_, carry):
            t, prev_c = carry
            c = phase_project_frames(mag_frames, t, fft_size, hop)
            return (c + momentum * (c - prev_c), c)

        _, last_c = jax.lax.fori_loop(
            0, n_iters, fbody, (signal, signal)
        )
        # return the last *projection* (a consistent signal), not the
        # extrapolated iterate
        return last_c

    def body(_, sig):
        return phase_project_frames(mag_frames, sig, fft_size, hop)

    return jax.lax.fori_loop(0, n_iters, body, signal)
