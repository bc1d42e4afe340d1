"""Synthesis runtime: bucketing, jit program cache, batching engine."""

from larynx_tpu.runtime.buckets import BucketPolicy  # noqa: F401
from larynx_tpu.runtime.engine import SynthesisEngine  # noqa: F401
