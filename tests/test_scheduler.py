"""Cross-request batch scheduler tests."""

import threading

import numpy as np
import pytest

from larynx_tpu.runtime.scheduler import BatchScheduler

# reuse the synthetic voice fixture
from test_pipeline import voices_dir  # noqa: F401


@pytest.fixture(scope="module")
def engine(voices_dir):
    import larynx_tpu

    larynx_tpu._TTS_MODEL_CACHE.clear()
    larynx_tpu._VOCODER_MODEL_CACHE.clear()
    larynx_tpu._ENGINE_CACHE.clear()

    tts = larynx_tpu.get_tts_model(
        "en-us_test_voice-glow_tts", custom_voices_dir=voices_dir
    )
    voc = larynx_tpu.get_vocoder_model("low", custom_voices_dir=voices_dir)
    return larynx_tpu._get_engine(tts, voc)


def test_concurrent_submits_coalesce(engine):
    scheduler = BatchScheduler(max_batch=8, max_wait_ms=500.0)
    rng = np.random.default_rng(0)
    # same text bucket (lengths < 16)
    seqs = [
        rng.integers(1, 46, size=rng.integers(8, 14)).astype(np.int64)
        for _ in range(8)
    ]

    futures = []
    barrier = threading.Barrier(8)

    def submit(seq):
        barrier.wait()
        futures.append(scheduler.submit(engine, seq))

    threads = [threading.Thread(target=submit, args=(s,)) for s in seqs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    audios = [f.result(timeout=300) for f in futures]
    for audio in audios:
        assert audio.dtype == np.int16
        assert audio.size > 0

    # 8 concurrent jobs in the same bucket must coalesce into few batches
    assert scheduler.jobs_run == 8
    assert scheduler.batches_run <= 3
    scheduler.shutdown()


def test_seeded_requests_reproducible_across_history(engine):
    """An explicitly-seeded request returns identical audio no matter how
    many batches the server ran before it (regression: the global batch
    counter fed jax.random.fold_in even for seeded jobs)."""
    scheduler = BatchScheduler(max_batch=8, max_wait_ms=10.0)
    ids = np.arange(1, 14, dtype=np.int64)

    first = scheduler.submit(engine, ids, seed=42).result(timeout=300)
    # advance server history with unseeded traffic
    for _ in range(3):
        scheduler.submit(engine, ids).result(timeout=300)
    again = scheduler.submit(engine, ids, seed=42).result(timeout=300)

    # two CONCURRENT identical seeded requests (e.g. a client retry) must
    # not perturb each other either — seeded jobs run as singleton groups
    f_a = scheduler.submit(engine, ids, seed=42)
    f_b = scheduler.submit(engine, ids, seed=42)
    conc_a = f_a.result(timeout=300)
    conc_b = f_b.result(timeout=300)
    scheduler.shutdown()

    np.testing.assert_array_equal(first, again)
    np.testing.assert_array_equal(first, conc_a)
    np.testing.assert_array_equal(first, conc_b)


def test_scheduler_through_server_path(voices_dir):
    """text_to_speech with a scheduler produces identical-shaped output."""
    import larynx_tpu

    scheduler = BatchScheduler(max_batch=4, max_wait_ms=20.0)
    results = list(
        larynx_tpu.text_to_speech(
            "One sentence here. Another sentence there.",
            voice_or_lang="en-us_test_voice-glow_tts",
            vocoder_or_quality="low",
            custom_voices_dir=voices_dir,
            scheduler=scheduler,
        )
    )
    assert len(results) == 2
    for r in results:
        assert r.audio is not None and r.audio.size > 500
    scheduler.shutdown()


def test_cross_bucket_coalesce(engine):
    """Sentences in different text buckets share one device batch: encode
    pads to the batch max bucket and the ragged vocoder crops each row
    group back to its own width."""
    scheduler = BatchScheduler(max_batch=8, max_wait_ms=1000.0)
    rng = np.random.default_rng(5)
    short = rng.integers(1, 46, size=6).astype(np.int64)
    long = rng.integers(1, 46, size=60).astype(np.int64)

    f_short = scheduler.submit(engine, short)
    f_long = scheduler.submit(engine, long)
    a_short = f_short.result(timeout=300)
    a_long = f_long.result(timeout=300)

    assert scheduler.jobs_run == 2
    assert scheduler.batches_run == 1
    assert 0 < a_short.size < a_long.size
    scheduler.shutdown()


def test_scheduler_error_propagation(engine):
    scheduler = BatchScheduler(max_batch=2, max_wait_ms=5.0)
    bad = np.zeros((3, 3), dtype=np.int64)  # malformed: 2-D id "sequence"
    future = scheduler.submit(engine, bad)
    with pytest.raises(Exception):
        future.result(timeout=120)
    scheduler.shutdown()


def test_mixed_settings_coalesce(engine):
    """Jobs differing only in noise/length/denoiser knobs share a batch
    (the knobs are per-row in the engine); per-row length_scale must
    actually stretch the row it belongs to."""
    scheduler = BatchScheduler(max_batch=8, max_wait_ms=1000.0)
    ids = np.arange(1, 13, dtype=np.int64)

    f_short = scheduler.submit(engine, ids, length_scale=1.0, noise_scale=0.2)
    f_long = scheduler.submit(engine, ids, length_scale=3.0, noise_scale=0.9)
    a_short = f_short.result(timeout=300)
    a_long = f_long.result(timeout=300)

    assert scheduler.jobs_run == 2
    assert scheduler.batches_run == 1  # one device batch despite knob mix
    # 3x length scale -> ~3x audio (duration math is per row)
    ratio = a_long.size / max(a_short.size, 1)
    assert 2.0 < ratio < 4.5, ratio
    scheduler.shutdown()
