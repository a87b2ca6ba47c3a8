"""Round-4 gather questions, measured (marginal-cost protocol).

  1. Shade-row table [164k, 48] gather: random vs sorted vs constant
     indices — is the per-index cost tile-DMA-bound, and do coherent /
     repeated indices get cheaper? (Decides whether depth compaction or
     slot-locality sorting can cut the ~130 ms/sample shade fetches.)
  2. Packed one-row state permute: permuting a [N, 32] f32 matrix by one
     gather vs 32 separate flat-[N] permutes (the round-2 wavefront sort
     did the latter at ~260 ms/sample; decides depth-compaction cost).
  3. bf16 vs f32 wide-row gather at [L, 37]-class tables: does halving
     element width halve the padded [N, 128]-lane intermediate cost?

Usage: python tools/microbench_gather2.py [n_lanes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
P = 164 * 1024  # shade-table rows
L = 5600        # light-table rows
K1, K2 = 2, 8


def main():
    import jax
    import jax.numpy as jnp

    def marginal(name, make_fn, reps=4):
        f1, f2 = make_fn(K1), make_fn(K2)
        out = []
        for f in (f1, f2):
            jax.block_until_ready(f(jnp.uint32(0)))
            ts = []
            for i in range(1, reps + 1):
                t0 = time.perf_counter()
                jax.block_until_ready(f(jnp.uint32(i)))
                ts.append(time.perf_counter() - t0)
            out.append(min(ts))
        per = (out[1] - out[0]) / (K2 - K1)
        print(f"{name:48s} {per * 1e3:9.2f} ms/op", flush=True)
        return per

    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.normal(size=(P, 48)).astype(np.float32))
    idx_rand = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
    idx_sort = jnp.sort(idx_rand)
    # clustered: ~N/8 distinct rows, adjacent lanes share (post-compaction
    # coherent-hit model)
    idx_clus = jnp.sort(jnp.asarray(
        rng.integers(0, P // 8, N).astype(np.int32) * 7 % P))
    idx_zero = jnp.zeros((N,), jnp.int32)

    def mk_gather(idx):
        def make(k):
            @jax.jit
            def f(s):
                acc = jnp.zeros((N,), jnp.float32) + s.astype(jnp.float32)
                ix = idx
                for _ in range(k):
                    g = table[ix]
                    acc = acc + g[:, 0]
                    ix = (ix + (acc.astype(jnp.int32) & 1)) % P
                return acc
            return f
        return make

    for name, ix in (("shade[164k,48] random", idx_rand),
                     ("shade[164k,48] sorted", idx_sort),
                     ("shade[164k,48] clustered x8", idx_clus),
                     ("shade[164k,48] constant", idx_zero)):
        marginal(name, mk_gather(ix))

    # --- 2. packed-row permute vs per-column permutes ---
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    state32 = jnp.asarray(rng.normal(size=(N, 32)).astype(np.float32))
    cols = [jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
            for _ in range(8)]

    def mk_rowperm(k):
        @jax.jit
        def f(s):
            st = state32 + s.astype(jnp.float32)
            for _ in range(k):
                st = st[perm]
                st = st + 1.0
            return st
        return f

    def mk_colperm(k):
        @jax.jit
        def f(s):
            cs = [c + s.astype(jnp.float32) for c in cols]
            for _ in range(k):
                cs = [c[perm] + 1.0 for c in cs]
            return sum(cs)
        return f

    marginal("[N,32] one-row-gather permute", mk_rowperm)
    marginal("8x flat [N] column permutes", mk_colperm)

    # --- 3. f32 vs bf16 wide-row gather ---
    lt32 = jnp.asarray(rng.normal(size=(L, 37)).astype(np.float32))
    lt16 = jnp.asarray(rng.normal(size=(L, 74)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    lidx = jnp.asarray(rng.integers(0, L, N).astype(np.int32))

    def mk_light(tab, w):
        def make(k):
            @jax.jit
            def f(s):
                acc = jnp.zeros((N,), jnp.float32) + s.astype(jnp.float32)
                ix = lidx
                for _ in range(k):
                    g = tab[ix]
                    acc = acc + g[:, :w].astype(jnp.float32).sum(axis=1)
                    ix = (ix + (acc.astype(jnp.int32) & 1)) % L
                return acc
            return f
        return make

    marginal("light[5.6k,37] f32 row gather+reduce", mk_light(lt32, 37))
    marginal("light[5.6k,74] bf16 row gather+reduce", mk_light(lt16, 74))


if __name__ == "__main__":
    main()
