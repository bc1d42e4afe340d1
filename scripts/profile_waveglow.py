#!/usr/bin/env python3
"""Decompose the full WaveGlow infer program's time: WN stack vs glue
(cond upsample, convinv 1x1s, coupling, early-chunk concats).

Isolated per-stage timings through the tunnel are meaningless (~24 ms
sync per dispatch); instead three FULL jitted programs are timed and
differenced:

  full     : the production infer (WN + glue)
  wn_only  : same WN calls and width schedule, convinv/exp replaced by
             pass-through adds (keeps shapes + data deps, drops glue math)
  glue_only: WN replaced by a tile of x0 (keeps every glue op + the cond
             upsample, drops the WN stack)

Run on the real chip:
  python scripts/profile_waveglow.py [--blocks 16384] [--batch 8]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from larynx_tpu.models.waveglow import model as wg_model
from larynx_tpu.models.waveglow.config import WaveGlowConfig


def _variant(params, cfg, mel, z, use_pallas, mode):
    """infer clone with the non-WN ('wn_only') or WN ('glue_only') work
    stubbed out; 'full' is the real program."""
    if mode == "full":
        return wg_model.infer(params, cfg, mel, z=z, use_pallas=use_pallas)
    cond = wg_model._upsample_cond(params, cfg, mel)
    b = mel.shape[0]
    early_flows = [
        k for k in range(cfg.flows) if k % cfg.early_every == 0 and k > 0
    ]
    offs = 0
    chunks = {}
    for k in early_flows:
        chunks[k] = z[..., offs : offs + cfg.early_size]
        offs += cfg.early_size
    x = z[..., offs:]
    for k in reversed(range(cfg.flows)):
        flow = params["flows"][k]
        n_half = x.shape[-1] // 2
        x0, x1 = x[..., :n_half], x[..., n_half:]
        if mode == "wn_only":
            out = wg_model._wn(
                flow["wn"], cfg, x0, cond, use_pallas=use_pallas
            )
            x1 = x1 + out[..., :n_half]  # keep the data dep, drop exp
            x = jnp.concatenate([x0, x1], axis=-1)
        else:  # glue_only: every glue op, WN stubbed
            out = jnp.tile(x0, (1, 1, 2))
            b_t, log_s = out[..., :n_half], out[..., n_half:]
            x1 = (x1 - b_t) * jnp.exp(-log_s)
            x = jnp.concatenate([x0, x1], axis=-1)
            x = jnp.einsum("btc,dc->btd", x, flow["convinv"]["w_inv"])
        if k in chunks:
            x = jnp.concatenate([chunks[k], x], axis=-1)
    return x.reshape(b, x.shape[1] * x.shape[2])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    cfg = WaveGlowConfig()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(dtype)
        if x.dtype in (jnp.float32, jnp.bfloat16)
        else x,
        wg_model.init_params(jax.random.PRNGKey(0), cfg),
    )
    m = args.blocks * cfg.groups // cfg.upsample_stride
    mel = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, m, cfg.mel_channels), dtype
    )
    z = jax.random.normal(
        jax.random.PRNGKey(2), (args.batch, args.blocks, cfg.groups), dtype
    )
    use_pallas = not args.no_pallas
    print(
        f"geometry: B={args.batch} mel={m} blocks={args.blocks} "
        f"dtype={args.dtype} pallas={use_pallas}",
        flush=True,
    )

    fns = {}
    for mode in ("full", "wn_only", "glue_only"):
        fns[mode] = jax.jit(
            lambda p, mel, z, mode=mode: _variant(
                p, cfg, mel, z, use_pallas, mode
            )
        )

    flops = {}
    for mode, fn in fns.items():
        try:
            c = fn.lower(params, mel, z).compile().cost_analysis()
            flops[mode] = float(c.get("flops", float("nan")))
        except Exception as e:  # noqa: BLE001
            flops[mode] = float("nan")
            print(f"cost_analysis {mode}: {e}", flush=True)

    results = {}
    for mode, fn in fns.items():
        out = fn(params, mel, z)  # warm
        float(jnp.sum(out.astype(jnp.float32)))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(params, mel, z)
            float(jnp.sum(out.astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        results[mode] = med
        tf = flops[mode] / 1e12
        print(
            f"{mode:9s} median {med * 1e3:7.1f} ms  "
            f"flops {tf:6.2f} TF  "
            f"eff {tf / med:6.1f} TF/s",
            flush=True,
        )
    full, wn, glue = (
        results["full"], results["wn_only"], results["glue_only"]
    )
    print(
        f"glue share (full - wn_only) = {(full - wn) * 1e3:.1f} ms "
        f"({100 * (full - wn) / full:.1f}% of full); "
        f"glue_only program alone = {glue * 1e3:.1f} ms",
        flush=True,
    )
    audio_s = args.blocks * cfg.groups / 22050 * args.batch
    print(f"vocode-compute RTF (full) = {full / audio_s:.6f}", flush=True)


if __name__ == "__main__":
    main()
