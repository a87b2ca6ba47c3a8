"""Traversal cost decomposition on the real chip.

Separates the three candidate bottlenecks of the wide-BVH walk:
  1. lockstep tail waste  — avg packet visits vs while_loop iterations
  2. row-gather cost      — a stripped loop doing ONLY the gather
  3. VPU compute cost     — the full body vs the gather-only loop

Usage: python tools/microbench_traverse.py [n_rays]
"""

import sys
import time

import numpy as np

_here = __import__("os").path.dirname(__file__)
sys.path.insert(0, _here)
sys.path.insert(0, __import__("os").path.dirname(_here))
from perf_traverse import random_rays, sphere_grid_scene  # noqa: E402


def steady(f, *args, warm=14, iters=20):
    import jax
    import jax.numpy as jnp

    r = jax.block_until_ready(f(*args, jnp.float32(0)))
    for i in range(warm):
        r = f(*args, jnp.float32((i + 1) * 1e-9))
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for i in range(iters):
        r = f(*args, jnp.float32((100 + i) * 1e-9))
    jax.block_until_ready(r)
    return (time.monotonic() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from luminary_tpu.ops.traverse import PACKET, _traverse_wide
    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.render.device_scene import pack_scene

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    scene = sphere_grid_scene()
    from pack_cache import cached_pack
    ds = cached_pack("sphere_grid_19x19", lambda: pack_scene(scene))
    bvh = ds.geo.bvh
    rows = bvh.rows
    print(f"rows {rows.shape} = {rows.nbytes/1e6:.1f} MB, depth {bvh.depth}, "
          f"nodes {bvh.num_nodes}")

    o, d = random_rays(n)
    # coherent set: one origin, directions in a narrow cone toward the grid
    rng = np.random.default_rng(5)
    dc = rng.normal(size=(n, 3)).astype(np.float32) * 0.05 + np.asarray(
        [0.5, -0.3, 0.5], np.float32
    )
    dc /= np.linalg.norm(dc, axis=1, keepdims=True)
    oc = Vec3(
        jnp.full((n,), 0.0), jnp.full((n,), 20.0), jnp.full((n,), 0.0)
    )
    dcv = Vec3(jnp.asarray(dc[:, 0]), jnp.asarray(dc[:, 1]), jnp.asarray(dc[:, 2]))

    g = n // PACKET

    # --- 1. iteration counts + utilization ---
    def counts(o_, d_, e):
        _, c = _traverse_wide(
            bvh, Vec3(o_.x + e, o_.y, o_.z), d_,
            jnp.full((n,), 3e38, jnp.float32), any_hit=False,
            debug_counters=True,
        )
        return c

    for name, oo, dd in (("incoherent", o, d), ("coherent", oc, dcv)):
        it, act, leaf = jax.jit(counts)(oo, dd, jnp.float32(0))
        it, act, leaf = int(it), int(act), int(leaf)
        print(f"{name}: iters {it}, avg visits/packet {act/g:.1f}, "
              f"lockstep util {act/(it*g)*100:.0f}%, leaf frac {leaf/act*100:.0f}%")

    # --- 2. full walk timing ---
    def full(o_, d_, e):
        return _traverse_wide(
            bvh, Vec3(o_.x + e, o_.y, o_.z), d_,
            jnp.full((n,), 3e38, jnp.float32), any_hit=False,
        ).t

    t_full = steady(jax.jit(full), o, d)
    print(f"full walk incoherent: {t_full:7.2f} ms ({n/t_full/1e3:6.2f} Mrays/s)")
    t_fullc = steady(jax.jit(full), oc, dcv)
    print(f"full walk coherent  : {t_fullc:7.2f} ms ({n/t_fullc/1e3:6.2f} Mrays/s)")

    # --- 3. gather-only loop at the same iteration count ---
    idx0 = jnp.asarray(
        np.random.default_rng(9).integers(0, rows.shape[0], g, dtype=np.int32)
    )

    def gather_only(iters):
        def f(idx, e):
            def body(i, carry):
                s, ix = carry
                r = rows[ix]  # [G, 128]
                s = s + r[:, :1]
                ix = (ix + jax.lax.bitcast_convert_type(r[:, 96], jnp.int32)) & (
                    rows.shape[0] - 1
                )
                ix = jnp.abs(ix) % rows.shape[0]
                return (s, ix)
            s, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((g, 1)) + e, idx)
            )
            return s
        return jax.jit(f)

    for it in (120,):
        t = steady(gather_only(it), idx0)
        print(f"gather-only x{it} at G={g}: {t:7.2f} ms "
              f"({t/it*1e3:6.1f} us/iter, {t/it/g*1e6:6.2f} ns/index)")

    # --- 4. slab-compute-only loop (no gather: fixed row) ---
    def slab_only(iters):
        row0 = rows[0]

        def f(o_, e):
            ox = o_.x.reshape(g, PACKET).T + e
            oy = o_.y.reshape(g, PACKET).T
            oz = o_.z.reshape(g, PACKET).T

            def body(i, s):
                rowT = row0[:, None] + s[:1, :1]  # [128, 1] broadcast → dep chain
                lo_x, hi_x = rowT[0:16], rowT[16:32]
                lo_y, hi_y = rowT[32:48], rowT[48:64]
                lo_z, hi_z = rowT[64:80], rowT[80:96]
                t1x = (lo_x[:, None, :] - ox[None]) * 1.7
                t2x = (hi_x[:, None, :] - ox[None]) * 1.7
                t1y = (lo_y[:, None, :] - oy[None]) * 1.3
                t2y = (hi_y[:, None, :] - oy[None]) * 1.3
                t1z = (lo_z[:, None, :] - oz[None]) * 0.7
                t2z = (hi_z[:, None, :] - oz[None]) * 0.7
                enter = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z),
                )
                leave = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z),
                )
                dist = jnp.min(jnp.where(enter <= leave, enter, np.inf), axis=1)
                return s + dist[:, :1] * 1e-30

            return jax.lax.fori_loop(0, iters, body, jnp.zeros((16, g)))

        return jax.jit(f)

    for it in (120,):
        t = steady(slab_only(it), o)
        print(f"slab-only   x{it} at G={g}: {t:7.2f} ms ({t/it*1e3:6.1f} us/iter)")


if __name__ == "__main__":
    main()
