"""TPU primitive microbenchmarks for the traversal redesign.

Measures the building blocks that decide the traversal architecture:
  a) XLA gather: table[idx] for a [M, C] table and [N] indices
  b) one-hot matmul gather: onehot(idx) @ table (MXU path)
  c) dense ray x triangle intersection throughput (VPU path)
  d) while_loop iteration overhead
Run on the default platform (the tunneled TPU chip) or BENCH_CPU=1.
"""

import os
import time

if os.environ.get("BENCH_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / iters


def main():
    print("platform:", jax.default_backend())
    n = 65536  # rays
    key = jax.random.PRNGKey(0)

    for m in (128, 1024, 8192):
        table = jax.random.normal(key, (m, 16), jnp.float32)
        idx = jax.random.randint(key, (n,), 0, m)

        @jax.jit
        def gather_loop(table, idx):
            def body(i, acc):
                vals = table[(idx + i) % m]
                return acc + vals.sum()

            return jax.lax.fori_loop(0, 32, body, 0.0)

        t = timeit(gather_loop, table, idx)
        print(f"a) gather       M={m:5d}: {t*1000:8.2f} ms /32 iters "
              f"({t/32*1e6:7.1f} us/iter, {n*16*4*32/t/1e9:6.1f} GB/s)")

        @jax.jit
        def onehot_loop(table, idx):
            def body(i, acc):
                oh = jax.nn.one_hot((idx + i) % m, m, dtype=jnp.bfloat16)
                vals = oh @ table.astype(jnp.bfloat16)
                return acc + vals.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, 32, body, 0.0)

        t = timeit(onehot_loop, table, idx)
        print(f"b) onehot-mm    M={m:5d}: {t*1000:8.2f} ms /32 iters "
              f"({t/32*1e6:7.1f} us/iter, {2*n*m*16*32/t/1e12:6.2f} TFLOP/s)")

    # c) dense ray-tri intersection: N rays x T tris
    for t_tris in (64, 256, 1024):
        v0 = jax.random.normal(key, (t_tris, 3))
        e1 = jax.random.normal(key, (t_tris, 3))
        e2 = jax.random.normal(key, (t_tris, 3))
        o = jax.random.normal(key, (n, 3))
        d = jax.random.normal(key, (n, 3))

        @jax.jit
        def dense(o, d, v0, e1, e2):
            pv = jnp.cross(d[:, None, :], e2[None])
            det = jnp.sum(e1[None] * pv, axis=-1)
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
            tv = o[:, None, :] - v0[None]
            u = jnp.sum(tv * pv, axis=-1) * inv
            qv = jnp.cross(tv, e1[None])
            v = jnp.sum(d[:, None, :] * qv, axis=-1) * inv
            tt = jnp.sum(e2[None] * qv, axis=-1) * inv
            hit = (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > 1e-4)
            return jnp.min(jnp.where(hit, tt, 3e38), axis=1)

        t = timeit(dense, o, d, v0, e1, e2)
        rays_per_s = n / t
        print(f"c) dense        T={t_tris:5d}: {t*1000:8.2f} ms "
              f"({rays_per_s/1e6:7.1f} Mray/s, {n*t_tris/t/1e9:7.1f} Gtest/s)")

    # d) while_loop overhead: trivial body
    @jax.jit
    def wl(x):
        def cond(s):
            i, x = s
            return i < 1000

        def body(s):
            i, x = s
            return i + 1, x + 1.0

        return jax.lax.while_loop(cond, body, (0, x))[1]

    t = timeit(wl, jnp.zeros((8, 128)))
    print(f"d) while_loop 1000 trivial iters: {t*1000:.2f} ms ({t*1e6/1000:.1f} us/iter)")

    # e) argsort (for ray binning / compaction)
    keys_arr = jax.random.randint(key, (n,), 0, 4096)

    @jax.jit
    def srt(k):
        return jnp.argsort(k)

    t = timeit(srt, keys_arr)
    print(f"e) argsort N=65536: {t*1000:.2f} ms")


if __name__ == "__main__":
    main()
