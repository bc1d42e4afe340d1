"""Checkpoint converters: reference artifacts -> JAX parameter pytrees.

Voice dirs contain ``generator.onnx`` (default) and/or ``generator.pth``
(reference loaders: glow_tts/checkpoint.py:26-68, hifi_gan/checkpoint.py:36-70).
Both are converted to the same pytree layout consumed by
``larynx_tpu.models.*``; weight-norm is folded and 1x1-conv inverses are
precomputed at conversion time (matching ``remove_weight_norm`` /
``store_inverse`` semantics).
"""

from larynx_tpu.convert.torch_import import (  # noqa: F401
    glow_tts_params_from_state_dict,
    hifi_gan_params_from_state_dict,
    load_torch_state_dict,
)
