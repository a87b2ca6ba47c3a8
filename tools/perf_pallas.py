"""XLA vs Pallas fused-body traversal shootout on the tree-tier scene.

Usage: python tools/perf_pallas.py [n_rays] [chunk]
"""

import sys
import time

import numpy as np

_here = __import__("os").path.dirname(__file__)
sys.path.insert(0, _here)
sys.path.insert(0, __import__("os").path.dirname(_here))
from perf_traverse import random_rays, sphere_grid_scene  # noqa: E402


def steady(f, *args, warm=14, iters=10):
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

    from luminary_tpu.ops.traverse import _traverse_wide, _chunked
    from luminary_tpu.ops.traverse_pallas import traverse_wide_pallas
    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.render.device_scene import pack_scene

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 17
    scene = sphere_grid_scene()
    ds = pack_scene(scene)
    bvh = ds.geo.bvh
    print(f"rows {bvh.rows.shape} = {bvh.rows.nbytes/1e6:.1f} MB, "
          f"depth {bvh.depth}")

    o, d = random_rays(n)
    rng = np.random.default_rng(5)
    dc = rng.normal(size=(n, 3)).astype(np.float32) * 0.05 + np.asarray(
        [0.5, -0.3, 0.5], np.float32)
    dc /= np.linalg.norm(dc, axis=1, keepdims=True)
    oc = Vec3(jnp.full((n,), 0.0), jnp.full((n,), 20.0), jnp.full((n,), 0.0))
    dcv = Vec3(*(jnp.asarray(dc[:, i]) for i in range(3)))

    def run_xla(o_, d_, e):
        def f(args):
            oo, dd, tm = args
            return _traverse_wide(bvh, oo, dd, tm, any_hit=False).t
        tm = jnp.full((n,), 3e38, jnp.float32)
        return _chunked(f, n, chunk, (Vec3(o_.x + e, o_.y, o_.z), d_, tm))

    def run_pallas(o_, d_, e):
        def f(args):
            oo, dd, tm = args
            return traverse_wide_pallas(bvh, oo, dd, tm, any_hit=False).t
        tm = jnp.full((n,), 3e38, jnp.float32)
        return _chunked(f, n, chunk, (Vec3(o_.x + e, o_.y, o_.z), d_, tm))

    for name, oo, dd in (("incoherent", o, d), ("coherent", oc, dcv)):
        for path, fn in (("xla", run_xla), ("pallas", run_pallas)):
            t = steady(jax.jit(fn), oo, dd)
            print(f"{name:10s} {path:6s}: {t:8.2f} ms "
                  f"({n/t/1e3:7.2f} Mrays/s)")


if __name__ == "__main__":
    main()
