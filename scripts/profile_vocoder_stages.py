#!/usr/bin/env python3
"""Per-stage HiFi-GAN vocoder profile on the real TPU.

Times each generator stage (upsample / MRF section / pre/post convs) as
its own jitted program at the stage's true geometry and layout, reports
useful GFLOP, achieved TFLOP/s and MFU, and A/Bs the wide upsample
stages' dilated-conv lowering against the phased dense-matmul form
(models/nn.py::conv_transpose1d_phased).  This is the measurement tool
behind the round-4 "drive vocode compute to the D2H floor" work; the
reference's own benchmark shows the vocoder dominating synthesis time
(etc/benchmark.txt).

Usage (TPU, production mixed-precision default):
  python scripts/profile_vocoder_stages.py --quality high --dtype bf16
"""

import argparse
import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan.model import (
    LRELU_SLOPE,
    _resblock1,
    _resblock2,
    generator,
    init_params,
)
from larynx_tpu.models.nn import (
    conv1d,
    conv_transpose1d,
    conv_transpose1d_phased,
    leaky_relu,
)

VOCODER_GEOMETRY = {
    "high": dict(),  # universal_large defaults
    "medium": dict(upsample_initial_channel=128),  # vctk_medium
    "low": dict(  # vctk_small
        resblock="2",
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
    ),
}

PEAK_TFLOPS = {"bfloat16": 197.0, "float32": 98.5}  # v5e MXU


def _time(fn, *args, reps=7):
    """Median wall ms of fn(*args) with block_until_ready."""
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(times)


def mrf_macs_per_step(cfg, c):
    per_step = 0
    cpu = 2 if cfg.resblock == "1" else 1
    for ks, ds in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
        per_step += len(ds) * cpu * ks * c * c
    return per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", default="high", choices=sorted(VOCODER_GEOMETRY))
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mel", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument(
        "--ab-full", action="store_true",
        help="time only the FULL generator, phased vs dilated ups, at a "
        "sweep of (batch, mel) group geometries",
    )
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = HiFiGanConfig(**VOCODER_GEOMETRY[args.quality])
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    use_pallas = not args.no_pallas

    b, m = args.batch, args.mel
    mel = jnp.asarray(
        np.random.RandomState(0).randn(b, m, cfg.num_mels), dtype=dtype
    )

    from larynx_tpu.ops.mrf_block import fused_mrf, pack_mrf_weights
    from larynx_tpu.ops.packed_ups import (
        conv_to_time_major,
        conv_transpose_packed,
    )

    if args.ab_full:
        up_total = int(np.prod(cfg.upsample_rates))
        results = []
        for gb, gm in [(b, m), (3, 5120), (8, 512), (1, 2048)]:
            gmel = jnp.asarray(
                np.random.RandomState(0).randn(gb, gm, cfg.num_mels),
                dtype=dtype,
            )
            row = {"batch": gb, "mel": gm}
            for mode in ("phased", "dilated"):
                f = jax.jit(functools.partial(
                    generator, params, cfg, use_pallas=use_pallas,
                    phased_ups=(mode == "phased"),
                ))
                ms = _time(f, gmel, reps=args.reps)
                row[mode + "_ms"] = round(ms, 2)
                audio_s = gb * gm * up_total / 22050
                row[mode + "_rtf"] = round(ms / 1e3 / audio_s, 6)
            row["speedup"] = round(row["dilated_ms"] / row["phased_ms"], 3)
            print(row, flush=True)
            results.append(row)
        print(json.dumps({
            "quality": args.quality, "dtype": args.dtype, "ab_full": results,
        }))
        return

    peak = PEAK_TFLOPS["bfloat16" if dtype == jnp.bfloat16 else "float32"]
    rows = []

    def report(name, ms, gflop, note=""):
        tfs = gflop / ms if ms > 0 else 0.0  # GFLOP/ms == TFLOP/s
        rows.append(
            dict(stage=name, ms=round(ms, 3), gflop=round(gflop, 2),
                 tflops=round(tfs, 1), mfu=round(100 * tfs / peak, 1),
                 note=note)
        )

    nk = cfg.num_kernels
    mrf_kwargs = dict(
        kernel_sizes=tuple(cfg.resblock_kernel_sizes),
        dilations_per_block=tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
        convs_per_unit=2 if cfg.resblock == "1" else 1,
        interpret=False,
    )

    # conv_pre
    f_pre = jax.jit(
        lambda xx: conv1d(xx, params["conv_pre"]["w"], params["conv_pre"]["b"], padding=3)
    )
    gf = 2 * b * m * 7 * cfg.num_mels * cfg.upsample_initial_channel / 1e9
    report("conv_pre", _time(f_pre, mel, reps=args.reps), gf)
    x = f_pre(mel)

    c = x.shape[-1]
    pack = 1
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        up = params["ups"][i]
        c_out = up["w"].shape[2]
        t_in = x.shape[1] * pack
        t_out = t_in * u
        useful_gf = 2 * b * t_out * (k // u if k % u == 0 else k) * c * c_out / 1e9

        go_packed = (
            use_pallas and c_out < 128 and 128 % c_out == 0
            and (pack * u * c_out) % 128 == 0
        )
        if go_packed:
            def f_up(xx, up=up, u=u, k=k, c=c, c_out=c_out, pack=pack):
                wide = conv_transpose_packed(
                    leaky_relu(xx, LRELU_SLOPE), up["w"], up["b"],
                    stride=u, padding=(k - u) // 2, c_in=c,
                )
                n_rows = wide.shape[1] * (pack * u * c_out) // 128
                return wide.reshape(wide.shape[0], n_rows, 128)
            f_up = jax.jit(f_up)
            report(f"up{i} packed {c}->{c_out} x{u}", _time(f_up, x, reps=args.reps), useful_gf)
            x = f_up(x)
            c, pack = c_out, 128 // c_out
        else:
            pad = (k - u) // 2
            if pack > 1:
                x = x.reshape(x.shape[0], x.shape[1] * pack, c)
                pack = 1
            f_dil = jax.jit(
                lambda xx, up=up, u=u, pad=pad: conv_transpose1d(
                    leaky_relu(xx, LRELU_SLOPE), up["w"], up["b"], stride=u, padding=pad
                )
            )
            ms_dil = _time(f_dil, x, reps=args.reps)
            report(
                f"up{i} dilated {c}->{c_out} x{u}", ms_dil, useful_gf,
                note=f"XLA pays ~{u}x useful",
            )
            if k % u == 0 and k - 2 * pad == u:
                f_ph = jax.jit(
                    lambda xx, up=up, u=u, pad=pad: conv_transpose1d_phased(
                        leaky_relu(xx, LRELU_SLOPE), up["w"], up["b"], stride=u, padding=pad
                    )
                )
                ms_ph = _time(f_ph, x, reps=args.reps)
                report(
                    f"up{i} phased  {c}->{c_out} x{u}", ms_ph, useful_gf,
                    note=f"{ms_dil / ms_ph:.2f}x vs dilated",
                )
                x = f_ph(x)
            else:
                x = f_dil(x)
            c = c_out

        stage_blocks = [params["resblocks"][i * nk + j] for j in range(nk)]
        gf_mrf = 2 * b * t_out * mrf_macs_per_step(cfg, c) / 1e9
        if pack > 1:
            f_mrf = jax.jit(
                functools.partial(
                    fused_mrf, weights=pack_mrf_weights(stage_blocks),
                    channels=c, total_len=x.shape[1] * pack, **mrf_kwargs,
                )
            )
            report(f"mrf{i} packed C={c}", _time(f_mrf, x, reps=args.reps), gf_mrf)
            x = f_mrf(x)
        elif use_pallas and c <= 128:
            f_mrf = jax.jit(
                functools.partial(
                    fused_mrf, weights=pack_mrf_weights(stage_blocks), **mrf_kwargs,
                )
            )
            report(f"mrf{i} fused C={c}", _time(f_mrf, x, reps=args.reps), gf_mrf)
            x = f_mrf(x)
        else:
            def f_mrf(xx, stage_blocks=stage_blocks):
                acc = None
                for j in range(nk):
                    rb = stage_blocks[j]
                    ks = cfg.resblock_kernel_sizes[j]
                    ds = cfg.resblock_dilation_sizes[j]
                    y = (_resblock1 if cfg.resblock == "1" else _resblock2)(rb, xx, ks, ds)
                    acc = y if acc is None else acc + y
                return acc / nk
            f_mrf = jax.jit(f_mrf)
            report(f"mrf{i} xla   C={c}", _time(f_mrf, x, reps=args.reps), gf_mrf)
            x = f_mrf(x)

    t_total = x.shape[1] * pack
    gf_post = 2 * b * t_total * 7 * c / 1e9
    if pack > 1:
        f_post = jax.jit(
            lambda xx: jnp.tanh(conv_to_time_major(
                leaky_relu(xx, 0.01), params["conv_post"]["w"],
                params["conv_post"]["b"], c_in=c,
            ))
        )
    else:
        f_post = jax.jit(
            lambda xx: jnp.tanh(conv1d(
                leaky_relu(xx, 0.01), params["conv_post"]["w"],
                params["conv_post"]["b"], padding=3,
            ))[..., 0]
        )
    report("conv_post", _time(f_post, x, reps=args.reps), gf_post)

    f_full = jax.jit(
        functools.partial(generator, params, cfg, use_pallas=use_pallas)
    )
    total_gf = sum(r["gflop"] for r in rows)
    ms_full = _time(f_full, mel, reps=args.reps)
    report("FULL generator", ms_full, total_gf)
    stage_sum = sum(r["ms"] for r in rows[:-1])

    audio_s = b * m * int(np.prod(cfg.upsample_rates)) / 22050
    hdr = f"{'stage':26s} {'ms':>9s} {'GFLOP':>8s} {'TF/s':>6s} {'MFU%':>5s}  note"
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(
            f"{r['stage']:26s} {r['ms']:9.3f} {r['gflop']:8.2f} "
            f"{r['tflops']:6.1f} {r['mfu']:5.1f}  {r['note']}"
        )
    print(
        f"\nstage-sum {stage_sum:.1f} ms vs full {ms_full:.1f} ms; "
        f"audio {audio_s:.1f}s -> vocode RTF {ms_full / 1e3 / audio_s:.5f}"
    )
    print(json.dumps({
        "quality": args.quality, "dtype": args.dtype, "batch": b, "mel": m,
        "full_ms": round(ms_full, 2), "stages": rows,
    }))


if __name__ == "__main__":
    main()
