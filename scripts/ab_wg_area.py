#!/usr/bin/env python3
"""Same-process alternating A/B of the WaveGlow per-dispatch area cap
(LARYNX_TPU_WAVEGLOW_AREA) on the pangram batch: 16384 (3-row groups,
3 dispatches) vs 4096 (the shipped default, MAX_VOCODE_AREA//4: 1-row
groups, 8 dispatches).  Round-5 verdict: 16384 measured 34% SLOWER
(see engine.waveglow_area) — the default stays 4096.

  python scripts/ab_wg_area.py [-n 6]
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from ab_common import run_ab  # noqa: E402
from bench import LENGTH_SCALE, build_engine, text_ids  # noqa: E402


def main() -> None:
    n_pairs = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv else 6

    def set_area(big: bool) -> None:
        os.environ["LARYNX_TPU_WAVEGLOW_AREA"] = "16384" if big else "4096"
        # waveglow_area() is uncached — env read per launch

    run_ab(
        build_engine("waveglow", half=False),
        (text_ids() * 8)[:8],
        set_area,
        ("area=16384", "area=4096 "),
        n_pairs,
        LENGTH_SCALE,
    )


if __name__ == "__main__":
    main()
