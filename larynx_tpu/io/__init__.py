"""Audio file I/O."""

from larynx_tpu.io.wavfile import read, write  # noqa: F401
