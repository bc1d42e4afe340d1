"""HTTP server package (aiohttp): web API, web UI, MaryTTS compatibility."""

from larynx_tpu.server.app import create_app  # noqa: F401
