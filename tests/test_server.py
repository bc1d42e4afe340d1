"""HTTP server endpoint tests (aiohttp test client, synthetic voice)."""

import asyncio
import io
import json

import numpy as np
import pytest

from aiohttp.test_utils import TestClient, TestServer

from larynx_tpu.io import wavfile
from larynx_tpu.server.app import ServerSettings, create_app


@pytest.fixture(scope="module")
def app_client(voices_dir):
    import larynx_tpu

    larynx_tpu._TTS_MODEL_CACHE.clear()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    larynx_tpu._ENGINE_CACHE.clear()

    loop = asyncio.new_event_loop()

    async def setup():
        app = create_app(
            ServerSettings(voices_dir=str(voices_dir), quality="low")
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        return client

    client = loop.run_until_complete(setup())
    yield client, loop
    loop.run_until_complete(client.close())
    loop.close()


# reuse the synthetic voice fixture from the pipeline tests
from test_pipeline import voices_dir  # noqa: E402,F401


def test_api_voices(app_client):
    client, loop = app_client
    resp = loop.run_until_complete(client.get("/api/voices"))
    assert resp.status == 200
    voices = loop.run_until_complete(resp.json())
    assert "en-us/test_voice-glow_tts" in voices
    assert voices["en-us/test_voice-glow_tts"]["downloaded"] is True
    # registry voices that aren't downloaded appear too
    assert "en-us/ljspeech-glow_tts" in voices


def test_api_vocoders(app_client):
    client, loop = app_client
    resp = loop.run_until_complete(client.get("/api/vocoders"))
    vocoders = loop.run_until_complete(resp.json())
    ids = {v["id"] for v in vocoders}
    assert "hifi_gan/vctk_small" in ids


def test_api_tts_get(app_client):
    client, loop = app_client
    resp = loop.run_until_complete(
        client.get(
            "/api/tts",
            params={
                "voice": "en-us/test_voice-glow_tts",
                "text": "Hello from the server.",
                "vocoder": "low",
            },
        )
    )
    assert resp.status == 200
    assert resp.content_type == "audio/wav"
    body = loop.run_until_complete(resp.read())
    rate, audio = wavfile.read(io.BytesIO(body))
    assert rate == 22050
    assert audio.size > 1000


def test_api_tts_post_body(app_client):
    client, loop = app_client
    resp = loop.run_until_complete(
        client.post(
            "/api/tts",
            params={"voice": "en-us_test_voice-glow_tts", "vocoder": "low"},
            data=b"Text in the post body.",
        )
    )
    assert resp.status == 200
    body = loop.run_until_complete(resp.read())
    assert body[:4] == b"RIFF"


def test_api_tts_missing_text_is_500_text(app_client):
    client, loop = app_client
    resp = loop.run_until_complete(
        client.get("/api/tts", params={"voice": "en-us/test_voice-glow_tts"})
    )
    assert resp.status == 500
    text = loop.run_until_complete(resp.text())
    assert "text" in text.lower()


def test_marytts_process(app_client):
    client, loop = app_client
    resp = loop.run_until_complete(
        client.get(
            "/process",
            params={
                "INPUT_TEXT": "Mary says hi.",
                "VOICE": "en-us_test_voice-glow_tts;low",
            },
        )
    )
    assert resp.status == 200
    body = loop.run_until_complete(resp.read())
    assert body[:4] == b"RIFF"


def test_marytts_process_post_text_only(app_client, voices_dir):
    """MaryTTS clients commonly POST only INPUT_TEXT; the POST path must
    default the locale like GET does (regression: voice='' -> 500)."""
    import shutil

    # 'en-us' resolves to the registry's language default voice, and the
    # MaryTTS default quality is high (reference parity); stage both so no
    # download is attempted
    default_dir = voices_dir / "en-us" / "mary_ann-glow_tts"
    if not default_dir.is_dir():
        shutil.copytree(voices_dir / "en-us" / "test_voice-glow_tts", default_dir)
    high_dir = voices_dir / "hifi_gan" / "universal_large"
    if not high_dir.is_dir():
        shutil.copytree(voices_dir / "hifi_gan" / "vctk_small", high_dir)

    client, loop = app_client
    resp = loop.run_until_complete(
        client.post("/process", data={"INPUT_TEXT": "Mary posts hi."})
    )
    assert resp.status == 200
    body = loop.run_until_complete(resp.read())
    assert body[:4] == b"RIFF"


def test_api_tts_unsynthesizable_text_returns_empty_wav(app_client):
    """Text with no mappable words must not 500 on np.concatenate([])."""
    client, loop = app_client
    resp = loop.run_until_complete(
        client.get(
            "/api/tts",
            params={
                "voice": "en-us_test_voice-glow_tts",
                "text": "@&%",
                "vocoder": "low",
            },
        )
    )
    assert resp.status == 200
    body = loop.run_until_complete(resp.read())
    assert body[:4] == b"RIFF"
    assert len(body) <= 128  # header only, no audio


def test_marytts_voices_and_version(app_client):
    client, loop = app_client
    resp = loop.run_until_complete(client.get("/voices"))
    text = loop.run_until_complete(resp.text())
    assert "test_voice;low en-us" in text

    resp = loop.run_until_complete(client.get("/version"))
    version = loop.run_until_complete(resp.text())
    assert version[0].isdigit()


def test_api_phonemes(app_client):
    client, loop = app_client
    resp = loop.run_until_complete(
        client.get("/api/phonemes", params={"language": "en-us"})
    )
    phonemes = loop.run_until_complete(resp.json())
    assert "aɪ" in phonemes
    # example words + synthesized example audio URLs (reference parity:
    # larynx/server.py:386-438 + shipped larynx/wav/)
    assert phonemes["ɛ"]["example"] == "bed"
    url = phonemes["aɪ"].get("url", "")
    assert url.startswith("wav/")
    resp = loop.run_until_complete(client.get("/" + url))
    body = loop.run_until_complete(resp.read())
    assert body[:4] == b"RIFF" and len(body) > 4000


def test_api_phonemes_builtin_inventory(app_client):
    """Languages with no installed voice fall back to the built-in table."""
    client, loop = app_client
    resp = loop.run_until_complete(
        client.get("/api/phonemes", params={"language": "sw"})
    )
    phonemes = loop.run_until_complete(resp.json())
    assert "ᵐɓ" in phonemes and "url" in phonemes["ᵐɓ"]


def test_index_and_openapi(app_client):
    client, loop = app_client
    resp = loop.run_until_complete(client.get("/"))
    html = loop.run_until_complete(resp.text())
    assert "Larynx TPU" in html
    assert "/api/tts" in html

    resp = loop.run_until_complete(client.get("/openapi/swagger.yaml"))
    yaml_text = loop.run_until_complete(resp.text())
    assert "openapi" in yaml_text

    resp = loop.run_until_complete(client.get("/openapi/swagger.json"))
    spec = loop.run_until_complete(resp.json())
    assert "/api/tts" in spec["paths"]

    resp = loop.run_until_complete(client.get("/openapi"))
    html = loop.run_until_complete(resp.text())
    assert "swagger.json" in html and "renderOp" in html


def test_api_tts_waveglow_vocoder(app_client, voices_dir):
    """vocoder=waveglow synthesizes through the server (the reference
    declares the type but cannot load it)."""
    import json as json_mod

    import jax

    from larynx_tpu.convert.native import save_params
    from larynx_tpu.models.waveglow import WaveGlowConfig
    from larynx_tpu.models.waveglow import model as wg_model

    wg_dir = voices_dir / "waveglow" / "wn_256"
    if not wg_dir.is_dir():
        wg_dir.mkdir(parents=True)
        cfg = WaveGlowConfig(
            mel_channels=80, flows=4, groups=8, early_every=2, early_size=2,
            wn_kernel_size=3, wn_channels=32, wn_layers=2,
            upsample_kernel=512, upsample_stride=256,
        )
        json_mod.dump(
            {
                "mel_channels": 80, "sampling_rate": 22050, "flows": 4,
                "groups": 8, "early_every": 2, "early_size": 2,
                "wn_kernel_size": 3, "wn_channels": 32, "wn_layers": 2,
                "upsample_kernel": 512, "upsample_stride": 256,
            },
            open(wg_dir / "config.json", "w"),
        )
        save_params(
            wg_dir / "generator.npz",
            wg_model.init_params(jax.random.PRNGKey(0), cfg),
        )

    client, loop = app_client
    resp = loop.run_until_complete(
        client.get(
            "/api/tts",
            params={
                "voice": "en-us_test_voice-glow_tts",
                "text": "Waveglow through the server.",
                "vocoder": "waveglow",
            },
        )
    )
    assert resp.status == 200
    body = loop.run_until_complete(resp.read())
    assert body[:4] == b"RIFF" and len(body) > 2000


def test_api_stream(app_client):
    """Chunked streaming endpoint: RIFF header + PCM chunks to EOF."""
    client, loop = app_client
    resp = loop.run_until_complete(
        client.get(
            "/api/stream",
            params={
                "voice": "en-us_test_voice-glow_tts",
                "text": "Streaming synthesis check.",
                "vocoder": "low",
                "chunkFrames": "16",
            },
        )
    )
    assert resp.status == 200
    body = loop.run_until_complete(resp.read())
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    # unknown-length streaming sizes
    assert body[4:8] == b"\xff\xff\xff\xff"
    assert len(body) > 44 + 8000  # header + real audio


def test_api_stream_client_disconnect_frees_executor(app_client):
    """A client that aborts mid-stream must not leave the producer thread
    blocked on the full chunk queue — that would permanently consume one
    of the shared executor threads and eventually hang every synthesis
    endpoint."""
    client, loop = app_client

    async def abort_stream():
        resp = await client.get(
            "/api/stream",
            params={
                "voice": "en-us_test_voice-glow_tts",
                "text": "A much longer sentence for the streaming "
                        "disconnect test, spoken slowly. " * 4,
                "vocoder": "low",
                "chunkFrames": "2",  # many chunks -> queue fills
                "lengthScale": "2.0",
            },
        )
        await resp.content.read(64)  # first bytes only, then hang up
        resp.close()

    loop.run_until_complete(abort_stream())

    # every executor thread must still be available for normal requests
    app = client.server.app
    from larynx_tpu.server.app import EXECUTOR_KEY

    executor = app.get(EXECUTOR_KEY)
    assert executor is not None, "server no longer exposes its executor"

    async def tts_ok():
        resp = await client.get(
            "/api/tts",
            params={
                "voice": "en-us_test_voice-glow_tts",
                "text": "Still alive.",
                "vocoder": "low",
            },
        )
        return resp.status, await resp.read()

    async def all_workers_free():
        # the producer's put gives up within ~0.5 s of the disconnect
        import concurrent.futures
        if executor is None:
            return
        await asyncio.sleep(0.7)
        n = executor._max_workers
        futs = [executor.submit(lambda: 42) for _ in range(n)]
        done, _ = concurrent.futures.wait(futs, timeout=5.0)
        assert len(done) == n, "executor thread leaked by aborted stream"

    loop.run_until_complete(all_workers_free())
    status, body = loop.run_until_complete(tts_ok())
    assert status == 200 and body[:4] == b"RIFF"


def test_api_tts_ssml_say_as_and_lexicon(app_client):
    """SSML through the HTTP API: say-as expansion and an inline
    <lexicon>/<lookup> pronunciation survive the whole server path."""
    client, loop = app_client
    markup = (
        "<speak>"
        '<lexicon id="x"><lexeme><grapheme>larynx</grapheme>'
        "<phoneme>l ˈɛ ɹ ɪ ŋ k s</phoneme></lexeme></lexicon>"
        'Dr. Smith used <lookup ref="x">larynx</lookup> on '
        '<say-as interpret-as="date" format="moy">4/1/2021</say-as>.'
        "</speak>"
    )
    resp = loop.run_until_complete(
        client.post(
            "/api/tts",
            params={
                "voice": "en-us_test_voice-glow_tts",
                "vocoder": "low",
                "ssml": "true",
            },
            data=markup.encode("utf-8"),
        )
    )
    assert resp.status == 200
    body = loop.run_until_complete(resp.read())
    rate, audio = wavfile.read(io.BytesIO(body))
    assert rate == 22050 and audio.size > 1000
