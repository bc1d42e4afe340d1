"""Device-side (JAX) DSP: STFT/ISTFT, mel chain, Griffin-Lim.

Import the submodules directly (``larynx_tpu.dsp.stft``,
``larynx_tpu.dsp.mel``); nothing is re-exported here to avoid shadowing the
module names with same-named functions.
"""

from larynx_tpu.dsp import mel, stft  # noqa: F401
