#!/usr/bin/env python3
"""Per-stage A/B timing of the HiFi-GAN vocoder on the live backend.

For each generator stage (conv_pre, per-stage upsample, per-stage MRF
resblock section, conv_post) this times the jitted stage program at the
geometry the bench actually runs, for both the production path
(use_pallas=True: packed/lane-dense narrow stages + fused MRF) and the
plain-XLA path — the stage table VERDICT round-3 item 1 asks for.

Usage:
  python scripts/profile_vocoder_stages.py [--b 2] [--m 8192] [--f32]
  python scripts/profile_vocoder_stages.py --quality low

Timing through the axon tunnel: every measurement forces a value read
(float(jnp.sum(...))) — block_until_ready alone can return early.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from larynx_tpu.models.hifi_gan import HiFiGanConfig
from larynx_tpu.models.hifi_gan import model as hifi_model
from larynx_tpu.models.hifi_gan.model import init_params

VOCODER_GEOMETRY = {
    "high": dict(),
    "medium": dict(upsample_initial_channel=128),
    "low": dict(
        resblock="2",
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
    ),
}


def _read(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def bench_fn(fn, *args, reps=5):
    out = fn(*args)
    _read(out)  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _read(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--quality", default="high")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    cfg = HiFiGanConfig(**VOCODER_GEOMETRY[args.quality])
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    params = jax.tree.map(
        lambda x: jnp.asarray(x, dtype), init_params(jax.random.PRNGKey(0), cfg)
    )
    mel = jax.random.normal(
        jax.random.PRNGKey(1), (args.b, args.m, cfg.num_mels), dtype=dtype
    )
    backend = jax.default_backend()
    print(f"# backend={backend} dtype={dtype.__name__} B={args.b} M={args.m} "
          f"quality={args.quality}")

    # ---- end-to-end A/B
    for use_pallas in (False, True) if backend != "cpu" else (False,):
        fn = jax.jit(
            lambda p, x, up=use_pallas: hifi_model.generator(p, cfg, x, use_pallas=up)
        )
        t, out = bench_fn(fn, params, mel, reps=args.reps)
        # FLOP model (see CLAUDE.md): resblocks 2*sum_k(k)*convs_per_k*C^2*T
        audio_samples = args.b * args.m * cfg.total_upsample
        print(f"full use_pallas={use_pallas}: {t*1e3:8.1f} ms  "
              f"({audio_samples / t / 1e6:.1f} Msamples/s)")

    # ---- per-stage (production path composition)
    nk = cfg.num_kernels
    c0 = cfg.upsample_initial_channel

    def stage_input(i):
        """Activation entering stage i in the DENSE layout."""
        t_i = args.m
        ch = c0
        for j in range(i):
            t_i *= cfg.upsample_rates[j]
            ch = c0 // (2 ** (j + 1))
        return jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(2), i),
            (args.b, t_i, ch), dtype=dtype,
        )

    rows = []

    # conv_pre
    from larynx_tpu.models.nn import conv1d, conv_transpose1d, leaky_relu

    t, _ = bench_fn(
        jax.jit(lambda p, x: conv1d(x, p["conv_pre"]["w"], p["conv_pre"]["b"], padding=3)),
        params, mel, reps=args.reps,
    )
    rows.append(("conv_pre", t, "-"))

    from larynx_tpu.ops.mrf_block import fused_mrf, pack_mrf_weights

    mrf_kwargs = dict(
        kernel_sizes=tuple(cfg.resblock_kernel_sizes),
        dilations_per_block=tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
        convs_per_unit=2 if cfg.resblock == "1" else 1,
    )

    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x_in = stage_input(i)
        up = params["ups"][i]
        c_in = x_in.shape[-1]
        c_out = up["w"].shape[2]

        t_up, x_out = bench_fn(
            jax.jit(
                lambda p, x, u=u, k=k, i=i: conv_transpose1d(
                    leaky_relu(x, 0.1), p["ups"][i]["w"], p["ups"][i]["b"],
                    stride=u, padding=(k - u) // 2,
                )
            ),
            params, x_in, reps=args.reps,
        )
        rows.append((f"up{i} {c_in}->{c_out} x{u}", t_up, "-"))

        stage_blocks = [params["resblocks"][i * nk + j] for j in range(nk)]

        def xla_mrf(p, x, i=i):
            blocks = [p["resblocks"][i * nk + j] for j in range(nk)]
            acc = None
            for j in range(nk):
                ks = cfg.resblock_kernel_sizes[j]
                ds = cfg.resblock_dilation_sizes[j]
                fn = hifi_model._resblock1 if cfg.resblock == "1" else hifi_model._resblock2
                y = fn(blocks[j], x, ks, ds)
                acc = y if acc is None else acc + y
            return acc / nk

        t_xla, _ = bench_fn(jax.jit(xla_mrf), params, x_out, reps=args.reps)

        t_pallas = None
        if backend != "cpu" and c_out <= 128:
            def pallas_mrf(p, x, i=i):
                blocks = [p["resblocks"][i * nk + j] for j in range(nk)]
                return fused_mrf(x, pack_mrf_weights(blocks), **mrf_kwargs)

            try:
                t_pallas, _ = bench_fn(jax.jit(pallas_mrf), params, x_out, reps=args.reps)
            except Exception as e:  # geometry not supported
                t_pallas = None
                print(f"# stage {i} pallas MRF failed: {type(e).__name__}: {e}",
                      file=sys.stderr)

        t_i = x_out.shape[1]
        conv_flops = (
            2
            * (2 if cfg.resblock == "1" else 1)
            * sum(
                ks * len(ds)
                for ks, ds in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            )
            * c_out * c_out * t_i * args.b
        )
        peak = 197e12 if dtype == jnp.bfloat16 else 99e12
        mfu = conv_flops / t_xla / peak
        label = f"mrf{i} C={c_out} T={t_i}"
        extra = f"xla {t_xla*1e3:7.1f} ms ({mfu*100:4.1f}% MFU)"
        if t_pallas is not None:
            mfu_p = conv_flops / t_pallas / peak
            extra += f"  pallas {t_pallas*1e3:7.1f} ms ({mfu_p*100:4.1f}% MFU, {t_xla/t_pallas:.2f}x)"
        rows.append((label, None, extra))

    for name, t, extra in rows:
        if t is not None:
            print(f"{name:24s} {t*1e3:8.1f} ms  {extra}")
        else:
            print(f"{name:24s} {extra}")


if __name__ == "__main__":
    main()
