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

    # two CONCURRENT identical seeded requests (e.g. a client retry)
    # coalesce into ONE batch; each row draws noise from its own seed so
    # they match each other exactly.  Against the singleton run the
    # padded program shapes differ (batch bucket 1 vs 2), so equality is
    # up to int16 rounding — the noise itself is bucket-independent.
    f_a = scheduler.submit(engine, ids, seed=42)
    f_b = scheduler.submit(engine, ids, seed=42)
    conc_a = f_a.result(timeout=300)
    conc_b = f_b.result(timeout=300)
    scheduler.shutdown()

    np.testing.assert_array_equal(first, again)
    np.testing.assert_array_equal(conc_a, conc_b)
    assert conc_a.shape == first.shape
    assert np.max(np.abs(conc_a.astype(np.int32) - first.astype(np.int32))) <= 2


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


def test_seeded_requests_coalesce_and_reproduce(engine):
    """VERDICT r2 item 10: seeded jobs with a deterministic vocoder
    (HiFi-GAN) batch together — each row's latent noise comes from its
    OWN seed — and every request reproduces bit-exactly when the same
    set is resubmitted in a different arrival order."""
    rng = np.random.default_rng(7)
    seqs = [
        rng.integers(1, 46, size=int(n)).astype(np.int64)
        for n in rng.integers(8, 15, size=8)
    ]
    seeds = [100 + i for i in range(8)]

    def run_batch(order):
        scheduler = BatchScheduler(max_batch=8, max_wait_ms=2000.0)
        barrier = threading.Barrier(8)
        futures = {}
        lock = threading.Lock()

        def submit(i):
            barrier.wait()
            f = scheduler.submit(engine, seqs[i], seed=seeds[i])
            with lock:
                futures[i] = f
        threads = [
            threading.Thread(target=submit, args=(i,)) for i in order
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        audios = {i: futures[i].result(timeout=300) for i in order}
        batches = scheduler.batches_run
        scheduler.shutdown()
        return audios, batches

    first, batches_a = run_batch(list(range(8)))
    again, batches_b = run_batch(list(reversed(range(8))))

    # the 8 seeded requests coalesced (not 8 singleton batches)
    assert batches_a <= 2, batches_a
    assert batches_b <= 2, batches_b
    for i in range(8):
        np.testing.assert_array_equal(first[i], again[i])

    # and a seeded request is invariant to running alone vs in the batch
    solo_sched = BatchScheduler(max_batch=8, max_wait_ms=10.0)
    solo = solo_sched.submit(engine, seqs[3], seed=seeds[3]).result(
        timeout=300
    )
    solo_sched.shutdown()
    a = first[3].astype(np.int32)
    b = solo.astype(np.int32)
    assert a.shape == b.shape
    # batchmates only change padded-bucket widths; row math is row-local,
    # so any residual difference is bounded by int16 rounding
    assert np.max(np.abs(a - b)) <= 2
