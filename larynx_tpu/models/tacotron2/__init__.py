"""Tacotron2 acoustic model (JAX, TPU-native).

The reference declares this family (larynx/constants.py:22) but never
implemented it; see model.py for the architecture and TPU design notes.
"""

from larynx_tpu.models.tacotron2.config import (  # noqa: F401
    Tacotron2Config,
    tacotron2_config_from_voice_json,
)
from larynx_tpu.models.tacotron2.model import (  # noqa: F401
    decode_inference,
    decode_teacher,
    encode,
    forward_teacher,
    infer,
    init_params,
    postnet,
)
