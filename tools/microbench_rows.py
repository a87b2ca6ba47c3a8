"""Shade/light row gather cost vs table width & dtype (real chip).

Decides whether quantizing the 72-col f32 shade rows (VERDICT item:
device_structs.h 32-B materials / 64-B tris) buys anything on TPU, where
gather cost may be per-INDEX (tile fetch) rather than per-byte.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def timeit(fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / iters

def main():
    n = 1 << 21  # 2M lanes (1080p wavefront)
    m = 166516   # bench-scene slot count
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, m, n, dtype=np.int32))
    idx_sorted = jnp.sort(idx)
    f = jax.jit(lambda t, i: t[i].sum(axis=1))
    for cols in (72, 36, 18):
        for dt in (jnp.float32, jnp.bfloat16):
            table = jnp.ones((m, cols), dt)
            t = timeit(f, table, idx)
            ts = timeit(f, table, idx_sorted)
            print(f"[{m},{cols}] {dt.__name__:9s}: {t*1e3:7.2f} ms random"
                  f"  {ts*1e3:7.2f} ms sorted", flush=True)
    # small dense table for contrast
    table = jnp.ones((4096, 18), jnp.float32)
    idx_s = idx % 4096
    print(f"[4096,18] f32: {timeit(f, table, idx_s)*1e3:7.2f} ms", flush=True)

if __name__ == "__main__":
    main()
