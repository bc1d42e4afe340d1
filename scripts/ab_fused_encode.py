#!/usr/bin/env python3
"""Same-process alternating A/B of the fused encode+decode dispatch
(LARYNX_TPU_FUSED_ENCODE) on the pangram batch.  Round-5 verdict: fused
measured 5.8% SLOWER (see engine.fused_encode_enabled) — default off.

  python scripts/ab_fused_encode.py [-n 8]
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import larynx_tpu.runtime.engine as engine_module  # noqa: E402
from ab_common import run_ab  # noqa: E402
from bench import LENGTH_SCALE, build_engine, text_ids  # noqa: E402


def main() -> None:
    n_pairs = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv else 8

    def set_fused(on: bool) -> None:
        os.environ["LARYNX_TPU_FUSED_ENCODE"] = "1" if on else "0"
        engine_module.fused_encode_enabled.cache_clear()

    run_ab(
        build_engine("high", half=False),
        (text_ids() * 8)[:8],
        set_fused,
        ("fused=on ", "fused=off"),
        n_pairs,
        LENGTH_SCALE,
    )


if __name__ == "__main__":
    main()
