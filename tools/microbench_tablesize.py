"""Gather cost vs table row count, [R, 128] f32 tables (real chip).

The round-3 compact-light-row win ([P,18] 73 ms -> [L,18] 3 ms at 2M
lanes) suggested a table-size knee: small tables gather at ~3 ns/index,
big ones pay a 4 KB tile DMA per index. This sweeps R to locate the knee
— it decides whether packing the 48-col shade table 8-triangles-per-row
([164k, 48] -> [20.5k, 128]) would move it under the knee.

Usage: python tools/microbench_tablesize.py [n_lanes]
"""

import sys
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)

    def steady(f, ix, iters=8):
        g = jax.jit(f)
        jax.block_until_ready(g(ix, jnp.float32(0)))
        for i in range(14):
            r = g(ix, jnp.float32(i) * 1e-9)
        jax.block_until_ready(r)
        t0 = time.monotonic()
        for i in range(iters):
            r = g(ix, jnp.float32(100 + i) * 1e-9)
        jax.block_until_ready(r)
        return (time.monotonic() - t0) / iters * 1e3

    for r_rows in (24576, 32768, 40960, 49152, 57344, 65536):
        table = jnp.asarray(rng.standard_normal((r_rows, 128), np.float32))
        idx = jnp.asarray(rng.integers(0, r_rows, N).astype(np.int32))

        def f(i, eps, table=table):
            return (table[i] + eps)[:, 0].sum()

        ms = steady(f, idx)
        mb = r_rows * 512 / 1e6
        print(f"R={r_rows:7d} ({mb:7.1f} MB)  {ms:8.2f} ms "
              f"({ms * 1e6 / N:.2f} ns/idx)", flush=True)


if __name__ == "__main__":
    main()
