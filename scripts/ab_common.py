"""Shared same-process alternating A/B harness for TPU bench variants.

Tunnel congestion swings run-to-run RTF far more than the effects under
test, so separate bench processes cannot compare fairly.  ``run_ab``
builds ONE warm engine workload and alternates variant runs within the
same process (ABBA ordering), so both variants sample the same
congestion profile; per-variant medians and their ratio are printed.
"""

import statistics
import time


def run_ab(engine, batch, set_variant, labels, n_pairs, length_scale):
    """Alternate two variants of ``engine.synthesize_batch`` runs.

    ``set_variant(flag)`` switches the variant under test (True = the
    first label).  Returns (median_true, median_false).
    """

    def run_once():
        t0 = time.perf_counter()
        audios = engine.synthesize_batch(batch, length_scale=length_scale)
        wall = time.perf_counter() - t0
        audio_s = sum(a.shape[-1] for a in audios) / 22050
        return wall / audio_s

    for on in (True, False, True, False):  # warm both variants' programs
        set_variant(on)
        run_once()

    results = {True: [], False: []}
    for i in range(n_pairs):
        for on in ((True, False) if i % 2 == 0 else (False, True)):
            set_variant(on)
            rtf = run_once()
            results[on].append(rtf)
            label = labels[0] if on else labels[1]
            print(f"{label} rtf={rtf:.6f}", flush=True)

    a_med = statistics.median(results[True])
    b_med = statistics.median(results[False])
    print(
        f"median {labels[0]} {a_med:.6f}  {labels[1]} {b_med:.6f}  "
        f"ratio {a_med / b_med:.3f}"
    )
    return a_med, b_med
