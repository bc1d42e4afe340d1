#!/usr/bin/env python3
"""Same-process alternating A/B of the WaveGlow per-dispatch area cap
(LARYNX_TPU_WAVEGLOW_AREA) on the pangram batch: 4096 (round-2 quarter
cap: 1-row groups, 8 dispatches) vs 16384 (round-5 default: 3-row
groups, 3 dispatches).

  python scripts/ab_wg_area.py [-n 6]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

import larynx_tpu.runtime.engine as engine_module  # noqa: E402
from bench import LENGTH_SCALE, build_engine, text_ids  # noqa: E402


def main() -> None:
    n_pairs = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv else 6
    engine = build_engine("waveglow", half=False)
    batch = (text_ids() * 8)[:8]

    def set_area(area: int) -> None:
        os.environ["LARYNX_TPU_WAVEGLOW_AREA"] = str(area)
        # waveglow_area() is uncached — env read per launch

    def run_once() -> float:
        t0 = time.perf_counter()
        audios = engine.synthesize_batch(batch, length_scale=LENGTH_SCALE)
        wall = time.perf_counter() - t0
        audio_s = sum(a.shape[-1] for a in audios) / 22050
        return wall / audio_s

    A, B = 4096, 16384
    for area in (A, B, A, B):  # warm both groupings' programs
        set_area(area)
        run_once()

    results = {A: [], B: []}
    for i in range(n_pairs):
        for area in ((A, B) if i % 2 == 0 else (B, A)):
            set_area(area)
            rtf = run_once()
            results[area].append(rtf)
            print(f"area={area:5d} rtf={rtf:.6f}", flush=True)

    a_med = statistics.median(results[A])
    b_med = statistics.median(results[B])
    print(
        f"median area-4096 {a_med:.6f}  area-16384 {b_med:.6f}  "
        f"16384/4096 {b_med / a_med:.3f}"
    )


if __name__ == "__main__":
    main()
