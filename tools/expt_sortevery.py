"""A/B the Pallas traversal's compaction cadence (sort_every) + GB block.

Packs the sphere-grid scene ONCE, then times traverse_wide_pallas at
several sort_every values on 1M incoherent closest + any-hit rays.
Usage: python tools/expt_sortevery.py [n_rays] [values...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from perf_traverse import random_rays, sphere_grid_scene  # noqa: E402

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from luminary_tpu.ops.traverse_pallas import traverse_wide_pallas
    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.render.device_scene import pack_scene
    from luminary_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    vals = [int(v) for v in sys.argv[2:]] or [0, 4, 8, 16]
    t0 = time.time()
    scene = sphere_grid_scene()
    from pack_cache import cached_pack
    ds = cached_pack("sphere_grid_19x19", lambda: pack_scene(scene))
    bvh = ds.geo.bvh
    print(f"pack {time.time()-t0:.0f}s rows {bvh.rows.shape}", flush=True)
    o, d = random_rays(n)
    tmax = jnp.full((n,), 3e38, jnp.float32)

    def steady(f, warm=14, iters=16):
        jax.block_until_ready(f(jnp.float32(0)))
        for i in range(warm):
            r = f(jnp.float32((i + 1) * 1e-9))
        jax.block_until_ready(r)
        t0 = time.monotonic()
        for i in range(iters):
            r = f(jnp.float32((100 + i) * 1e-9))
        jax.block_until_ready(r)
        return (time.monotonic() - t0) / iters * 1e3

    for se in vals:
        for any_hit in (False, True):
            def run(e, se=se, any_hit=any_hit):
                h = traverse_wide_pallas(
                    bvh, Vec3(o.x + e, o.y, o.z), d, tmax,
                    any_hit=any_hit, sort_every=se)
                return h.t if not any_hit else h.t
            f = jax.jit(run)
            t = steady(f)
            tag = "occl " if any_hit else "close"
            print(f"sort_every={se:3d} {tag}: {t:7.2f} ms "
                  f"({n/t/1e3:6.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
