#!/usr/bin/env python3
"""A/B the fused-WN kernel's time tile on the full WaveGlow vocode.

The state-fused Pallas WN layer (ops/wn_layer.py) re-fetches ~1.7 MB of
weights per grid step at wn_256 geometry; a larger time tile amortizes
that DMA over more MXU work at the cost of VMEM.  This script times the
FULL jitted ``infer`` program (per CLAUDE.md, isolated stage timings
through the tunnel are meaningless — only whole-program A/Bs count) at
the bench-like geometry for a sweep of tiles.

Run on the real chip:
  python scripts/ab_wn_tile.py [--blocks 16384] [--batch 8] [--dtype bf16]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from larynx_tpu.models.waveglow.config import WaveGlowConfig
from larynx_tpu.models.waveglow import model as wg_model
from larynx_tpu.ops import wn_layer


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--tiles", default="512,1024,2048")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    cfg = WaveGlowConfig()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(
        lambda x: x.astype(dtype)
        if x.dtype in (jnp.float32, jnp.bfloat16)
        else x,
        wg_model.init_params(key, cfg),
    )
    m = args.blocks * cfg.groups // cfg.upsample_stride  # mel frames
    mel = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, m, cfg.mel_channels), dtype
    )
    z = jax.random.normal(
        jax.random.PRNGKey(2),
        (args.batch, args.blocks, cfg.groups), dtype,
    )
    print(
        f"geometry: B={args.batch} mel={m} blocks={args.blocks} "
        f"dtype={args.dtype}", file=sys.stderr,
    )

    results = {}
    for tile in [int(t) for t in args.tiles.split(",")]:
        wn_layer.default_tile.cache_clear()
        import os

        os.environ["LARYNX_TPU_WN_TILE"] = str(tile)
        # a FRESH jit wrapper per tile: default_tile() is read at trace
        # time, so reusing one jit object would silently reuse the first
        # tile's compiled program
        fn = jax.jit(
            lambda p, mel_, z_: wg_model.infer(
                p, cfg, mel_, z=z_, use_pallas=True
            )
        )
        try:
            out = fn(params, mel, z)
            _ = float(jnp.sum(out))  # force execution (tunnel-safe)
        except Exception as exc:  # VMEM blowups etc.
            print(f"tile {tile}: FAILED {type(exc).__name__}: {exc}",
                  file=sys.stderr)
            results[tile] = None
            continue
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(params, mel, z)
            _ = float(jnp.sum(out))
            times.append((time.perf_counter() - t0) * 1e3)
        med = statistics.median(times)
        results[tile] = med
        print(f"tile {tile}: {med:.1f} ms  (runs: "
              + ", ".join(f"{t:.1f}" for t in times) + ")",
              file=sys.stderr)

    base = results.get(512)
    for tile, med in results.items():
        if med and base:
            print(f"tile {tile}: {med:.1f} ms  ({base / med:.2f}x vs 512)")


if __name__ == "__main__":
    main()
