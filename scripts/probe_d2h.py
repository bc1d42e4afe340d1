"""Calibrate today's device->host tunnel rate.

Measures single-stream D2H bandwidth on FRESH (non-constant-foldable)
int16 arrays of bench-like sizes, median of 5. Interpreting bench RTF
readings requires knowing the day's tunnel rate: the pangram batch moves
~19 MB of int16 audio, so at 41 MB/s the transfer floor alone is ~0.46 s
(RTF ~0.0010) while at 30 MB/s it is ~0.63 s (RTF ~0.0014).

Run with the TPU otherwise idle.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    key = jax.random.PRNGKey(0)
    for mb in (5, 10, 20):
        n = mb * 1024 * 1024 // 2
        rates = []
        for i in range(5):
            # fresh data each time: random bits defeat constant folding
            # and any transfer-level caching
            key, sub = jax.random.split(key)
            x = (
                jax.random.randint(sub, (n,), -32768, 32767, jnp.int32)
                .astype(jnp.int16)
            )
            x.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(x)
            dt = time.perf_counter() - t0
            rates.append(mb / dt)
        med = sorted(rates)[len(rates) // 2]
        print(
            f"{mb:3d} MB: median {med:6.1f} MB/s  "
            f"(runs {' '.join(f'{r:.1f}' for r in rates)})"
        )


if __name__ == "__main__":
    main()
