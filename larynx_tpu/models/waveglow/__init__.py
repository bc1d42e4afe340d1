from larynx_tpu.models.waveglow.config import (  # noqa: F401
    WaveGlowConfig,
    waveglow_config_from_json,
)
