"""GlowTTS acoustic model, TPU-native JAX implementation.

Re-design of the reference PyTorch model (glow_tts/models.py:216-366) as a
set of pure functions over a parameter pytree, staged for static-shape
bucketed execution under jit.
"""

from larynx_tpu.models.glow_tts.config import (  # noqa: F401
    GlowTTSConfig,
    config_from_voice_json,
)
from larynx_tpu.models.glow_tts.model import (  # noqa: F401
    decode_reverse,
    encode,
    expand_and_decode,
    init_params,
)
