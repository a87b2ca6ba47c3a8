"""Column-extraction cost on [N, k<128] gather outputs (real chip).

The profile (round 4) shows the post-gather EXTRACTION fusions — not the
gathers — dominating the lights/shade/aerial clusters: every column read
of a [N, k] f32 array pays full (8,128)-padded tiles, and XLA emits one
such pass per consumer fusion (~5 ms each at 2M lanes).

Patterns measured (all on a [N, 48] gather from a 164k-row table):
  A. current: 10 independent column-expression consumers
  B. transpose once behind an optimization_barrier, slice rows, same
     consumers
  C. one-fusion consumer (all columns in a single expression)
Plus the aerial-curve pattern: reshape(-1, 16, 3) component mix vs
component-planar 16-col slices.
"""

import os
import sys
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
P = 164 * 1024


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((P, 48), np.float32))
    idx = jnp.asarray(rng.integers(0, P, N).astype(np.int32))

    def consumers_cols(row):
        outs = []
        for c in range(0, 30, 3):
            outs.append(row[:, c] * 2.0 + row[:, c + 1] * row[:, c + 2])
        # force separate fusions: chain each through a cheap reduce
        return sum(o.sum() for o in outs[:3]) + sum(
            (o * o).sum() for o in outs[3:])

    def consumers_rows(rt):
        outs = []
        for c in range(0, 30, 3):
            outs.append(rt[c] * 2.0 + rt[c + 1] * rt[c + 2])
        return sum(o.sum() for o in outs[:3]) + sum(
            (o * o).sum() for o in outs[3:])

    def pat_a(i, eps):
        row = table[i] + eps
        return consumers_cols(row)

    def pat_b(i, eps):
        row = table[i] + eps
        rt = jax.lax.optimization_barrier(row.T)
        return consumers_rows(rt)

    def pat_c(i, eps):
        row = table[i] + eps
        outs = [row[:, c] * 2.0 + row[:, c + 1] * row[:, c + 2]
                for c in range(0, 30, 3)]
        return sum(outs).sum()

    # F: gather -> PALLAS block transpose to planar [48, N] -> row consumers.
    # The XLA transpose (pattern B) costs as much as ~10 consumer passes;
    # if the Pallas pass is ~bandwidth, planar extraction wins at >2
    # consumers.
    from jax.experimental import pallas as pl

    TGB = 2048

    def _tkern(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    def pallas_T(rowarr):
        n, c = rowarr.shape
        return pl.pallas_call(
            _tkern,
            grid=(n // TGB,),
            in_specs=[pl.BlockSpec((TGB, c), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((c, TGB), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((c, n), rowarr.dtype),
        )(rowarr)

    def pat_f(i, eps):
        row = table[i] + eps
        rt = pallas_T(row)
        return consumers_rows(rt)

    # aerial pattern: [N, 128] row, mix 16 knots x 3 components
    arow_t = jnp.asarray(rng.standard_normal((2048, 128), np.float32))
    aidx = jnp.asarray(rng.integers(0, 2048, N).astype(np.int32))
    sel_host = jnp.asarray(rng.standard_normal((N, 16), np.float32))

    def aerial_interleaved(i, eps):
        row = arow_t[i] + eps
        cur = row[:, 0:48].reshape(-1, 16, 3)
        return (jnp.sum(cur[..., 0] * sel_host, axis=1)
                + jnp.sum(cur[..., 1] * sel_host, axis=1)
                + jnp.sum(cur[..., 2] * sel_host, axis=1)).sum()

    def aerial_planar(i, eps):
        row = arow_t[i] + eps
        return (jnp.sum(row[:, 0:16] * sel_host, axis=1)
                + jnp.sum(row[:, 16:32] * sel_host, axis=1)
                + jnp.sum(row[:, 32:48] * sel_host, axis=1)).sum()

    def steady(f, ix=idx, iters=12):
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

    print(f"N={N}  table [{P},48]", flush=True)
    print(f"A 10-consumer column reads : {steady(pat_a):8.2f} ms", flush=True)
    print(f"B barrier-transpose+slices : {steady(pat_b):8.2f} ms", flush=True)
    print(f"C single-fusion columns    : {steady(pat_c):8.2f} ms", flush=True)
    print(f"F pallas-transpose planar  : {steady(pat_f):8.2f} ms", flush=True)
    print(f"aerial interleaved reshape : {steady(aerial_interleaved, aidx):8.2f} ms",
          flush=True)
    print(f"aerial component-planar    : {steady(aerial_planar, aidx):8.2f} ms",
          flush=True)


def main2():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((P, 48), np.float32))
    idx = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
    idx_s = jnp.sort(idx)

    def pat_d(i, eps):
        # one fusion writes a [30, N] planar extract; consumers read rows
        row = table[i] + eps
        ext = jax.lax.optimization_barrier(
            jnp.stack([row[:, c] for c in range(30)]))
        outs = []
        for c in range(0, 30, 3):
            outs.append(ext[c] * 2.0 + ext[c + 1] * ext[c + 2])
        return sum(o.sum() for o in outs[:3]) + sum(
            (o * o).sum() for o in outs[3:])

    def pat_e(i, eps):
        row = table[i] + eps
        return row[:, 0].sum()

    def steady(f, ix, iters=12):
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

    print(f"D stack-to-planar + slices : {steady(pat_d, idx):8.2f} ms",
          flush=True)
    print(f"E gather alone             : {steady(pat_e, idx):8.2f} ms",
          flush=True)
    print(f"E gather alone (sorted idx): {steady(pat_e, idx_s):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    # PART2=1 runs only the D/E patterns; default runs only A-C + aerial.
    main2() if os.environ.get("PART2") else main()
