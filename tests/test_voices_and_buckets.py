"""Unit tests: voice registry/name grammar, bucket policy, language codes."""

import numpy as np
import pytest

from larynx_tpu.runtime.buckets import BucketPolicy
from larynx_tpu.text.langs import resolve_lang
from larynx_tpu.voices import (
    VOCODER_QUALITY,
    get_voice_download_name,
    get_voices_dirs,
    list_voices,
    resolve_voice_name,
    split_voice_name,
)


def test_voice_alias_resolution():
    assert resolve_voice_name("harvard") == "en-us_harvard-glow_tts"
    assert resolve_voice_name("harvard-glow_tts") == "en-us_harvard-glow_tts"
    assert resolve_voice_name("en-us_harvard-glow_tts") == "en-us_harvard-glow_tts"
    assert resolve_voice_name("en") == "en-us_mary_ann-glow_tts"
    assert resolve_voice_name("de") == "de-de_thorsten-glow_tts"
    assert resolve_voice_name("sw") == "sw_biblia_takatifu-glow_tts"
    # unknown names pass through
    assert resolve_voice_name("en-us_custom-glow_tts") == "en-us_custom-glow_tts"


def test_split_voice_name():
    assert split_voice_name("en-us_harvard-glow_tts") == (
        "en-us", "harvard", "glow_tts",
    )
    assert split_voice_name("de-de_eva_k-glow_tts") == ("de-de", "eva_k", "glow_tts")
    # names with dashes in them
    assert split_voice_name("nl_bart_de_leeuw-glow_tts") == (
        "nl", "bart_de_leeuw", "glow_tts",
    )
    # no explicit model type: default, don't chop the last character
    assert split_voice_name("de-de_thorsten") == (
        "de-de", "thorsten", "glow_tts",
    )


def test_vocoder_alias_resolution(tmp_path):
    """Dash-form aliases from the reference VOCODERS file resolve to the
    actual model dir (None is also every silent-failure return, so the
    positive case must LOAD something); unknown names raise clearly."""
    import json

    import jax
    import pytest

    import larynx_tpu
    from larynx_tpu import get_vocoder_model
    from larynx_tpu.constants import VocoderType
    from larynx_tpu.convert.native import save_params
    from larynx_tpu.models.hifi_gan import HiFiGanConfig
    from larynx_tpu.models.hifi_gan.model import init_params as hifi_init

    voc_dir = tmp_path / "hifi_gan" / "vctk_small"
    voc_dir.mkdir(parents=True)
    cfg = HiFiGanConfig(
        resblock="2", upsample_initial_channel=32,
        upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (2, 6)),
    )
    json.dump(
        {
            "audio": {"num_mels": 80, "sampling_rate": 22050},
            "model": {
                "resblock": "2", "upsample_initial_channel": 32,
                "upsample_rates": [8, 8, 4],
                "upsample_kernel_sizes": [16, 16, 8],
                "resblock_kernel_sizes": [3, 5],
                "resblock_dilation_sizes": [[1, 2], [2, 6]],
            },
        },
        open(voc_dir / "config.json", "w"),
    )
    save_params(
        voc_dir / "generator.npz", hifi_init(jax.random.PRNGKey(0), cfg)
    )

    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    m = get_vocoder_model(
        "hifi_gan-vctk_small", no_download=True, custom_voices_dir=tmp_path
    )
    assert m is not None and m.config.model_path == voc_dir
    larynx_tpu._VOCODER_MODEL_CACHE.clear()

    with pytest.raises(ValueError, match="Unknown vocoder"):
        get_vocoder_model(
            "not_a_vocoder", no_download=True,
            custom_voices_dir="/nonexistent",
        )


def test_registry_complete():
    voices = list_voices()
    assert len(voices) == 51  # the reference's released voice count
    langs = {lang for _, lang, _ in voices}
    assert langs == {
        "de-de", "en-us", "es-es", "fr-fr", "it-it", "nl", "ru-ru", "sv-se", "sw",
    }
    assert get_voice_download_name("ljspeech") == "en-us_ljspeech-glow_tts"
    assert VOCODER_QUALITY["high"] == "hifi_gan/universal_large"


def test_voices_dirs_priority(tmp_path, monkeypatch):
    monkeypatch.setenv("LARYNX_VOICES_DIR", str(tmp_path / "env"))
    dirs = get_voices_dirs(tmp_path / "arg")
    assert dirs[0] == tmp_path / "arg"
    assert dirs[1] == tmp_path / "env"
    # production search path must not bake in the oracle checkout
    assert all("reference" not in str(d) for d in dirs)
    monkeypatch.setenv("LARYNX_TPU_EXTRA_VOICES_DIRS", str(tmp_path))
    assert get_voices_dirs(tmp_path / "arg")[-1] == tmp_path


def test_resolve_lang():
    assert resolve_lang("en") == "en-us"
    assert resolve_lang("EN_us") == "en-us"
    assert resolve_lang("de") == "de-de"
    assert resolve_lang("nl-nl") == "nl"
    assert resolve_lang(None) == "en-us"
    assert resolve_lang("sv") == "sv-se"


def test_bucket_policy():
    policy = BucketPolicy()
    assert policy.text_bucket(1) == 16
    assert policy.text_bucket(16) == 16
    assert policy.text_bucket(17) == 32
    assert policy.text_bucket(400) == 768  # beyond grid: rounded up
    assert policy.mel_bucket(1) == 64
    assert policy.mel_bucket(63) % policy.n_sqz == 0
    assert policy.mel_bucket(5000) == 5120  # 512-step grid past 4096
    assert policy.mel_bucket(4100) == 4608
    assert policy.batch_bucket(3) == 4
    assert policy.batch_bucket(16) == 16
    assert policy.batch_bucket(17) == 32


def test_group_by_text_bucket():
    policy = BucketPolicy()
    lengths = [10, 12, 30, 11, 200, 14, 15]
    groups = policy.group_by_text_bucket(lengths, max_batch=3)
    # bucket-16 items split at max_batch 3: [0,1,3], [5,6]; bucket-32: [2];
    # bucket-256: [4]
    flat = [i for g in groups for i in g]
    assert sorted(flat) == list(range(len(lengths)))
    for group in groups:
        buckets = {policy.text_bucket(lengths[i]) for i in group}
        assert len(buckets) == 1
        assert len(group) <= 3


def test_download_voice_from_local_http(tmp_path):
    """download_voice: tarball fetch + <lang>/<voice> extraction layout."""
    import http.server
    import io
    import tarfile
    import threading

    from larynx_tpu.voices import VoiceDownloadError, download_voice

    # build a voice tarball: en-us/test_dl-glow_tts/{config.json,phonemes.txt}
    src = tmp_path / "src" / "en-us" / "test_dl-glow_tts"
    src.mkdir(parents=True)
    (src / "config.json").write_text("{}")
    (src / "phonemes.txt").write_text("0 _\n")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        tar.add(tmp_path / "src" / "en-us", arcname="en-us")
    (tmp_path / "voice.tar.gz").write_bytes(buf.getvalue())

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **kw
    )
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        dest = tmp_path / "voices"
        voice_dir = download_voice(
            "test_dl", dest, f"http://127.0.0.1:{port}/voice.tar.gz"
        )
        assert voice_dir == dest / "en-us" / "test_dl-glow_tts"
        assert (voice_dir / "phonemes.txt").is_file()

        with pytest.raises(VoiceDownloadError):
            download_voice(
                "missing", dest, f"http://127.0.0.1:{port}/nope.tar.gz"
            )
    finally:
        server.shutdown()
