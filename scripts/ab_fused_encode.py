#!/usr/bin/env python3
"""Same-process alternating A/B of the fused encode+decode dispatch
(LARYNX_TPU_FUSED_ENCODE) on the pangram batch.

  python scripts/ab_fused_encode.py [-n 8]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

import larynx_tpu.runtime.engine as engine_module  # noqa: E402
from bench import LENGTH_SCALE, build_engine, text_ids  # noqa: E402


def main() -> None:
    n_pairs = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv else 8
    engine = build_engine("high", half=False)
    batch = (text_ids() * 8)[:8]

    def set_fused(on: bool) -> None:
        os.environ["LARYNX_TPU_FUSED_ENCODE"] = "1" if on else "0"
        engine_module.fused_encode_enabled.cache_clear()

    def run_once() -> float:
        t0 = time.perf_counter()
        audios = engine.synthesize_batch(batch, length_scale=LENGTH_SCALE)
        wall = time.perf_counter() - t0
        audio_s = sum(a.shape[-1] for a in audios) / 22050
        return wall / audio_s

    for on in (False, True, False, True):  # warm both programs
        set_fused(on)
        run_once()

    results = {True: [], False: []}
    for i in range(n_pairs):
        for on in ((True, False) if i % 2 == 0 else (False, True)):
            set_fused(on)
            rtf = run_once()
            results[on].append(rtf)
            print(f"fused={'on ' if on else 'off'} rtf={rtf:.6f}", flush=True)

    on_med = statistics.median(results[True])
    off_med = statistics.median(results[False])
    print(
        f"median fused-on {on_med:.6f}  fused-off {off_med:.6f}  "
        f"on/off {on_med / off_med:.3f}"
    )


if __name__ == "__main__":
    main()
