"""HiFi-GAN vocoder, TPU-native JAX implementation."""

from larynx_tpu.models.hifi_gan.config import (  # noqa: F401
    HiFiGanConfig,
    hifi_gan_config_from_json,
)
from larynx_tpu.models.hifi_gan.model import generator, init_params  # noqa: F401
