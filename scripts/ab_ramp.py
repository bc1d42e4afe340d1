#!/usr/bin/env python3
"""Same-process alternating A/B of the vocode first-group ramp
(LARYNX_TPU_RAMP_FIRST_GROUP) on the pangram batch.  Round-5 rerun
(10 pairs): ramp-on 0.93x of off — the ramp helps.

  python scripts/ab_ramp.py [-n 6]
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import larynx_tpu.runtime.engine as engine_module  # noqa: E402
from ab_common import run_ab  # noqa: E402
from bench import LENGTH_SCALE, build_engine, text_ids  # noqa: E402


def main() -> None:
    n_pairs = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv else 6

    def set_ramp(on: bool) -> None:
        os.environ["LARYNX_TPU_RAMP_FIRST_GROUP"] = "1" if on else "0"
        engine_module.ramp_first_group.cache_clear()

    run_ab(
        build_engine("high", half=False),
        (text_ids() * 8)[:8],
        set_ramp,
        ("ramp=on ", "ramp=off"),
        n_pairs,
        LENGTH_SCALE,
    )


if __name__ == "__main__":
    main()
