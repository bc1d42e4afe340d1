"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so sharding/pjit paths are
exercised without TPU hardware.  Must run before anything imports jax.
"""

import os
import sys
from pathlib import Path

# Configure the CPU backend before it is instantiated.  Note: on the build
# machine a sitecustomize registers a TPU ("axon") backend at interpreter
# startup, so jax may already be imported — the env var alone is not enough;
# we must also flip the config knob below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REPO_ROOT = Path(__file__).parent.parent
REFERENCE_DIR = Path("/root/reference")

sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def reference_dir() -> Path:
    """Path to the read-only upstream reference checkout (oracle for parity
    tests); tests using it are skipped when it is not mounted."""
    if not REFERENCE_DIR.is_dir():
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def reference_torch(reference_dir):
    """Import the reference PyTorch packages (glow_tts / hifi_gan) as a
    numerical oracle.  Never copied — only executed to produce golden
    activations for parity assertions."""
    sys.path.insert(0, str(reference_dir))
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch not available")
    yield reference_dir
    sys.path.remove(str(reference_dir))
