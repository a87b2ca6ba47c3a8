"""Round-3 de-risk, part 2: true in-executable costs via chained fori_loop
(PERF_NOTES method 3 — marginal (T2-T1)/(K2-K1) with scalar readback).

  E2c: scalar-indexed row fetch loop inside ONE pallas kernel — ns/row.
  E3c: one-hot MXU gather kernel chained K times — ns/row.
  E5 : pallas slab-test kernel (traversal body shape) chained — per-call cost.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 8192
COLS = 128


def chain_time(make_fn, k1=4, k2=16):
    """Marginal per-iteration cost of a data-dependent chain."""
    f1, f2 = make_fn(k1), make_fn(k2)
    for f in (f1, f2):  # compile + warm past fresh-executable slowdown
        for i in range(14):
            x = f(jnp.float32(i * 1e-6))
        jax.block_until_ready(x)
    reps = 5
    ts = []
    for f, k in ((f1, k1), (f2, k2)):
        t0 = time.perf_counter()
        for i in range(reps):
            x = f(jnp.float32(100 + i) * 1e-7)
        _ = float(jnp.ravel(x)[0])
        ts.append((time.perf_counter() - t0) / reps)
    return (ts[1] - ts[0]) / (k2 - k1)


def e2c_scalar_loop():
    """K row-fetches inside one kernel via fori_loop + SMEM scalar index.
    The index chain is data-dependent (idx from previous row's bits)."""
    ROWS_PER_CALL = 4096

    def kernel(seed_ref, tab_ref, out_ref):
        def body(i, carry):
            idx, acc = carry
            row = tab_ref[idx, :]
            nidx = (jnp.float32(idx) + row[0] * 0 + 1).astype(jnp.int32) % S
            # force data dependence through row values:
            nidx = (nidx + (row[1] > 2.0).astype(jnp.int32)) % S
            return nidx, acc + row
        idx0 = (seed_ref[0] * 1e6).astype(jnp.int32) % S
        _, acc = jax.lax.fori_loop(
            0, ROWS_PER_CALL, body, (idx0, jnp.zeros((COLS,), jnp.float32)))
        out_ref[0, :] = acc

    tab = jnp.asarray(np.random.rand(S, COLS), jnp.float32)

    def make_fn(k):
        @jax.jit
        def run(seed):
            def step(i, s):
                r = pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((1, COLS), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(jnp.stack([s]), tab)
                return r[0, 0] * 1e-9 + s
            return jax.lax.fori_loop(0, k, step, seed)
        return run

    dt = chain_time(make_fn)
    per_row = dt / ROWS_PER_CALL
    print(f"E2c scalar-loop fetch: {dt*1e6:.1f} us/call "
          f"-> {per_row*1e9:.1f} ns/row ({1/per_row/1e6:.1f} Mrows/s)")


def e5_slab_body(G=1024, fetch_mode="none"):
    """Traversal-body-shaped kernel: per call, G packets x 16 children slab
    test on [16, G] register state + 8-ray [8, G] rays + select/argmin.
    fetch_mode: 'none' (state already in VMEM) or 'scalarloop' (fetch G rows
    by scalar loop into scratch first).
    """
    def kernel(seed_ref, tab_ref, ox_ref, fetch_ref, out_ref, rows_s):
        if fetch_mode == "scalarloop":
            def fb(g, _):
                rows_s[g, :] = tab_ref[fetch_ref[g, 0], :]
                return 0
            jax.lax.fori_loop(0, G, fb, 0)
            rowT = rows_s[:].T  # [128, G]
        else:
            rowT = tab_ref[0:G, :].T
        s = seed_ref[0]
        lo_x, hi_x = rowT[0:16], rowT[16:32]
        lo_y, hi_y = rowT[32:48], rowT[48:64]
        lo_z, hi_z = rowT[64:80], rowT[80:96]
        ox = ox_ref[:] + s  # [8, G]
        t1x = (lo_x[:, None, :] - ox[None]) * 1.7
        t2x = (hi_x[:, None, :] - ox[None]) * 1.7
        t1y = (lo_y[:, None, :] - ox[None]) * 0.3
        t2y = (hi_y[:, None, :] - ox[None]) * 0.3
        t1z = (lo_z[:, None, :] - ox[None]) * 1.1
        t2z = (hi_z[:, None, :] - ox[None]) * 1.1
        enter = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                        jnp.minimum(t1y, t2y)),
                            jnp.minimum(t1z, t2z))
        leave = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                        jnp.maximum(t1y, t2y)),
                            jnp.maximum(t1z, t2z))
        ok = enter <= leave
        dist16 = jnp.min(jnp.where(ok, enter, np.inf), axis=1)  # [16, G]
        sel = jnp.argmin(dist16, axis=0)  # [G]
        out_ref[0, :] = jnp.min(dist16, axis=0) + sel.astype(jnp.float32)

    tab = jnp.asarray(np.random.rand(S, COLS), jnp.float32)
    ox = jnp.asarray(np.random.rand(8, G), jnp.float32)
    fetch = jnp.asarray(np.random.randint(0, S, (G, 1)), jnp.int32)

    def make_fn(k):
        @jax.jit
        def run(seed):
            def step(i, s):
                r = pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.SMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((G, COLS), jnp.float32)],
                )(jnp.stack([s]), tab, ox, fetch)
                return r[0, 0] * 1e-9 + s
            return jax.lax.fori_loop(0, k, step, seed)
        return run

    dt = chain_time(make_fn)
    print(f"E5 slab body G={G} fetch={fetch_mode}: {dt*1e6:.1f} us/call "
          f"({dt/G*1e9:.1f} ns/packet-step)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("e2c", "all"):
        e2c_scalar_loop()
    if which in ("e5", "all"):
        e5_slab_body(1024, "none")
        e5_slab_body(1024, "scalarloop")
