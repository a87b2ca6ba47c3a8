"""Cost of ray-sorting machinery on the real chip.

If argsort + permute is cheap relative to a traversal wave (~150 ms/Mray
incoherent), sorting rays by (live, direction octant, origin morton) before
tracing pays for itself via packet coherence + lockstep-tail reduction.

Usage: python tools/microbench_sort.py [n]
"""

import sys
import time

import numpy as np


def steady(f, *args, warm=12, iters=20):
    import jax
    import jax.numpy as jnp

    r = jax.block_until_ready(f(*args, jnp.uint32(0)))
    for i in range(warm):
        r = f(*args, jnp.uint32(i + 1))
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for i in range(iters):
        r = f(*args, jnp.uint32(100 + i))
    jax.block_until_ready(r)
    return (time.monotonic() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    rows8 = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    rows4 = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))

    t = steady(jax.jit(lambda k, e: jnp.argsort(k ^ e)), keys)
    print(f"argsort u32 [{n}]:        {t:7.2f} ms")

    t = steady(
        jax.jit(lambda k, e: jnp.sort(k ^ e)), keys
    )
    print(f"sort u32 [{n}]:           {t:7.2f} ms")

    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    t = steady(jax.jit(lambda p, r, e: r[p + (e - e).astype(jnp.int32)]), perm, rows8)
    print(f"row gather [{n},8]:       {t:7.2f} ms")
    t = steady(jax.jit(lambda p, r, e: r[p + (e - e).astype(jnp.int32)]), perm, rows4)
    print(f"row gather [{n},4]:       {t:7.2f} ms")

    # flat gather per component (the layout we use today)
    flat = [jnp.asarray(rng.normal(size=(n,)).astype(np.float32)) for _ in range(8)]

    def g8(p, e, *fs):
        q = p + (e - e).astype(jnp.int32)
        return [f[q] for f in fs]

    t = steady(jax.jit(lambda p, e: g8(p, e, *flat)), perm)
    print(f"8x flat [N] gathers:      {t:7.2f} ms")

    # full sort-trace-unsort overhead estimate: argsort + 8-col gather +
    # argsort(perm) + 4-col gather
    def pipeline(k, r8, e):
        p = jnp.argsort(k ^ e)
        sorted_rows = r8[p]
        inv = jnp.argsort(p)
        out = sorted_rows[:, :4][inv]
        return out

    t = steady(jax.jit(pipeline), keys, rows8)
    print(f"sort+permute+unsort:      {t:7.2f} ms")


if __name__ == "__main__":
    main()
