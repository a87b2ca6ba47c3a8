"""De-risk experiments for the Pallas traversal kernel (round 3).

Questions, in order of importance:
  E1: does Mosaic lower a per-lane row gather from a VMEM-resident table
      (jnp.take / ref[idx_vec] / take_along_axis)?  At what throughput?
  E2: scalar-indexed dynamic-slice row fetch in a fori_loop — rows/s?
  E3: one-hot MXU gather — rows/s at table sizes ~10k.

Run:  python tools/proto_pallas_gather.py [e1|e2|e3|all]
"""

import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 8192          # table rows
COLS = 128
N = 64 * 1024     # gather count per kernel call


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # vary input to defeat the axon result cache (PERF_NOTES pitfall 1)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # ground truth: scalar readback
    _ = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.ravel(out)[0])
    t1 = time.perf_counter()
    return (t1 - t0) / iters


def e1_take():
    """Per-lane gather via jnp.take inside a Pallas kernel."""
    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]          # [N] int32 in VMEM
        out_ref[:] = jnp.take(tab_ref[:], idx, axis=0)

    tab = jnp.asarray(np.random.rand(S, COLS), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, S, N), jnp.int32)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, COLS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    try:
        dt = timeit(run, tab, idx)
        print(f"E1 jnp.take: OK  {dt*1e3:.3f} ms -> {N/dt/1e6:.1f} Mrows/s, "
              f"{N*COLS*4/dt/1e9:.0f} GB/s")
    except Exception as e:
        print(f"E1 jnp.take: FAIL {type(e).__name__}: {str(e)[:500]}")


def e1b_takealong():
    """take_along_axis variant."""
    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]          # [N, 1]
        out_ref[:] = jnp.take_along_axis(
            tab_ref[:], jnp.broadcast_to(idx, (N, COLS)), axis=0)

    tab = jnp.asarray(np.random.rand(S, COLS), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, S, (N, 1)), jnp.int32)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, COLS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    try:
        dt = timeit(run, tab, idx)
        print(f"E1b take_along_axis: OK  {dt*1e3:.3f} ms -> {N/dt/1e6:.1f} "
              f"Mrows/s, {N*COLS*4/dt/1e9:.0f} GB/s")
    except Exception as e:
        print(f"E1b take_along_axis: FAIL {type(e).__name__}: {str(e)[:500]}")


def e2_scalar_loop():
    """Scalar dynamic-slice row fetches in a fori_loop (SMEM indices)."""
    K = 2048  # fetches per call

    def kernel(idx_ref, tab_ref, out_ref):
        def body(i, acc):
            row = tab_ref[idx_ref[i], :]   # scalar index from SMEM
            return acc + row
        out_ref[0, :] = jax.lax.fori_loop(
            0, K, body, jnp.zeros((COLS,), jnp.float32))

    tab = jnp.asarray(np.random.rand(S, COLS), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, S, K), jnp.int32)

    @jax.jit
    def run(idx, tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, COLS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tab)

    try:
        dt = timeit(run, idx, tab)
        print(f"E2 scalar loop: OK  {dt*1e3:.3f} ms for {K} rows -> "
              f"{K/dt/1e6:.2f} Mrows/s  ({dt/K*1e9:.0f} ns/row)")
    except Exception as e:
        print(f"E2 scalar loop: FAIL {type(e).__name__}: {str(e)[:500]}")


def e3_onehot():
    """One-hot MXU gather: [G, S] @ [S, 128]."""
    G = 512

    def kernel(tab_ref, idx_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
        onehot = (iota == idx_ref[:]).astype(jnp.bfloat16)  # idx [G, 1]
        out_ref[:] = jnp.dot(onehot, tab_ref[:].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)

    tab = jnp.asarray(np.random.rand(S, COLS), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, S, (G, 1)), jnp.int32)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, COLS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    try:
        dt = timeit(run, tab, idx)
        print(f"E3 onehot MXU: OK  {dt*1e3:.3f} ms for {G} rows -> "
              f"{G/dt/1e6:.2f} Mrows/s  ({dt/G*1e9:.0f} ns/row)")
    except Exception as e:
        print(f"E3 onehot MXU: FAIL {type(e).__name__}: {str(e)[:500]}")


def e4_dyn_slice_vec():
    """ref[idx_vec] direct vector indexing (alt syntax)."""
    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:], :]

    tab = jnp.asarray(np.random.rand(S, COLS), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, S, N), jnp.int32)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, COLS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    try:
        dt = timeit(run, tab, idx)
        print(f"E4 ref[idx_vec]: OK  {dt*1e3:.3f} ms -> {N/dt/1e6:.1f} "
              f"Mrows/s, {N*COLS*4/dt/1e9:.0f} GB/s")
    except Exception as e:
        print(f"E4 ref[idx_vec]: FAIL {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("e1", "all"):
        e1_take()
        e1b_takealong()
    if which in ("e4", "all"):
        e4_dyn_slice_vec()
    if which in ("e2", "all"):
        e2_scalar_loop()
    if which in ("e3", "all"):
        e3_onehot()
