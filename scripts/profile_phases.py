#!/usr/bin/env python3
"""Per-phase wall-time breakdown of the synthesis pipeline on the TPU.

Unlike ``bench.py`` (which measures the production pipelined path
end-to-end), this script inserts explicit ``block_until_ready`` syncs
between stages so each phase's device time is measured in ISOLATION:

  encode   dispatch + compute (blocked)
  y_sync   the y_lengths device->host round trip alone
  decode   dispatch + compute (blocked), exact bucket
  vocode   dispatch + compute (blocked)
  collect  device->host audio transfer + crop

It also times the production overlapped path (predicted bucket, D2H
behind compute) for the same batch so the benefit of the overlap is
visible as (sum of isolated phases) - (pipelined wall).

Run on the real chip:  python scripts/profile_phases.py [--half] [-n 5]
Results go to stderr as a table; median over n trials.
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from bench import LENGTH_SCALE, build_engine, text_ids  # noqa: E402


def main() -> None:
    half = "--half" in sys.argv
    trials = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv else 5
    quality = "high"
    if "--quality" in sys.argv:
        quality = sys.argv[sys.argv.index("--quality") + 1]

    engine = build_engine(quality, half)
    batch = (text_ids() * 8)[:8]
    n = len(batch)

    # warm up every program this script uses (exact-bucket decode AND the
    # predicted-bucket production path) so trial medians are compile-free
    enc_out, g = engine.encode_launch(batch, LENGTH_SCALE)
    y_lengths = np.asarray(enc_out[4])
    mel, z_mask, key = engine.decode_launch(enc_out, y_lengths, g, n)
    parts = engine.vocode_launch(mel, z_mask, n, 0.0, key, y_lengths=y_lengths)
    engine.vocode_collect(parts, mel.shape[0])
    engine.synthesize_batch(batch, length_scale=LENGTH_SCALE)
    engine.synthesize_batch(batch, length_scale=LENGTH_SCALE)

    rows = {k: [] for k in (
        "encode", "y_sync", "decode", "vocode", "collect", "iso_total",
        "pipelined",
    )}
    for _ in range(trials):
        # --- isolated phases ---
        t0 = time.perf_counter()
        enc_out, g = engine.encode_launch(batch, LENGTH_SCALE)
        jax.block_until_ready(enc_out)
        t1 = time.perf_counter()
        y_lengths = np.asarray(enc_out[4])
        t2 = time.perf_counter()
        mel, z_mask, key = engine.decode_launch(
            enc_out, y_lengths, g, n, noise_scale=0.667
        )
        jax.block_until_ready(mel)
        t3 = time.perf_counter()
        parts = engine.vocode_launch(
            mel, z_mask, n, 0.0, key, y_lengths=y_lengths
        )
        jax.block_until_ready([p[0] for p in parts])
        t4 = time.perf_counter()
        audio_rows = engine.vocode_collect(parts, mel.shape[0])
        engine.crop_rows(audio_rows, y_lengths, n, 0.0)
        t5 = time.perf_counter()
        rows["encode"].append(t1 - t0)
        rows["y_sync"].append(t2 - t1)
        rows["decode"].append(t3 - t2)
        rows["vocode"].append(t4 - t3)
        rows["collect"].append(t5 - t4)
        rows["iso_total"].append(t5 - t0)

        # --- production overlapped path ---
        t0 = time.perf_counter()
        engine.synthesize_batch(batch, length_scale=LENGTH_SCALE)
        rows["pipelined"].append(time.perf_counter() - t0)

    print(f"# {quality} batch={n} half={half} trials={trials}", file=sys.stderr)
    for k, v in rows.items():
        ms = [1e3 * x for x in v]
        print(
            f"{k:10s} median {statistics.median(ms):8.1f} ms   "
            f"min {min(ms):8.1f}   max {max(ms):8.1f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
