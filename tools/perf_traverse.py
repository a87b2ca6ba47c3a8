"""Traversal performance harness (run on the real TPU chip).

Measures steady-state closest/any-hit trace time on a ~127k-tri sphere-grid
scene with incoherent rays — the tree-tier worst case. The remote executor
caches (executable, inputs) → results, so every timed call varies a traced
epsilon argument; the first ~12 calls after compile are warmup (~40 ms extra
each) and excluded.

Usage: python tools/perf_traverse.py [n_rays]
"""

import os
import sys
import time

import numpy as np

# NOT via PYTHONPATH: an inherited PYTHONPATH breaks the axon jax-plugin
# entry-point registration on the bench host
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sphere_grid_scene(nx=19, nz=19):
    from luminary_tpu.scene import Material, Mesh, Scene

    def sphere(cx, cy, cz, r, nu=16, nv=12):
        u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
        v = np.linspace(1e-3, np.pi - 1e-3, nv)
        uu, vv = np.meshgrid(u, v, indexing="ij")
        x = cx + r * np.cos(uu) * np.sin(vv)
        y = cy + r * np.cos(vv)
        z = cz + r * np.sin(uu) * np.sin(vv)
        verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
        tris = []
        for i in range(nu):
            for j in range(nv - 1):
                a = i * nv + j
                b = ((i + 1) % nu) * nv + j
                tris += [[a, b, a + 1], [b, b + 1, a + 1]]
        return verts, np.asarray(tris, np.int32)

    scene = Scene()
    scene.add_material(Material(albedo=(0.7, 0.7, 0.7, 1.0), roughness=0.4))
    rng = np.random.default_rng(1)
    V, T, off = [], [], 0
    for gx in range(nx):
        for gz in range(nz):
            v, t = sphere(gx * 2.5, rng.uniform(0.5, 1.5), gz * 2.5, 1.0)
            V.append(v)
            T.append(t + off)
            off += len(v)
    mesh = Mesh(
        vertices=np.concatenate(V), triangles=np.concatenate(T), name="spheres"
    )
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)
    return scene


def random_rays(n, lo=(20, 8, 20), hi=(28, 12, 28), seed=2):
    import jax.numpy as jnp

    from luminary_tpu.ops.vec import Vec3

    rng = np.random.default_rng(seed)
    o = Vec3(
        jnp.asarray(rng.uniform(lo[0], hi[0], n).astype(np.float32)),
        jnp.asarray(rng.uniform(lo[1], hi[1], n).astype(np.float32)),
        jnp.asarray(rng.uniform(lo[2], hi[2], n).astype(np.float32)),
    )
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dv = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    return o, dv


def steady(f, o, d, warm=15, iters=30):
    """Steady-state ms/call of f(o, d, eps) with a cache-defeating eps."""
    import jax
    import jax.numpy as jnp

    r = jax.block_until_ready(f(o, d, jnp.float32(0)))
    for i in range(warm):
        r = f(o, d, jnp.float32((i + 1) * 1e-9))
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for i in range(iters):
        r = f(o, d, jnp.float32((100 + i) * 1e-9))
    jax.block_until_ready(r)
    return (time.monotonic() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from luminary_tpu.ops.traverse import trace_closest, trace_occluded
    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.render.device_scene import pack_scene

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    scene = sphere_grid_scene()
    t0 = time.monotonic()
    from pack_cache import cached_pack
    ds = cached_pack("sphere_grid_19x19", lambda: pack_scene(scene))
    bvh = ds.geo.bvh
    print(
        f"pack {time.monotonic()-t0:.1f}s | slots {bvh.tri_v0.x.shape[0]} "
        f"rows {bvh.rows.shape[0]} depth {bvh.depth}"
    )
    o, d = random_rays(n)

    fc = jax.jit(
        lambda o_, d_, e: trace_closest(bvh, Vec3(o_.x + e, o_.y, o_.z), d_, chunk=None)
    )
    t = steady(fc, o, d)
    print(f"closest : {t:7.2f} ms  ({n/t/1e3:6.1f} Mrays/s)")
    fo = jax.jit(
        lambda o_, d_, e: trace_occluded(
            bvh, Vec3(o_.x + e, o_.y, o_.z), d_, 3e38, chunk=None
        )
    )
    t = steady(fo, o, d)
    print(f"occluded: {t:7.2f} ms  ({n/t/1e3:6.1f} Mrays/s)")
    # shadow-like: finite t_max
    fs = jax.jit(
        lambda o_, d_, e: trace_occluded(
            bvh, Vec3(o_.x + e, o_.y, o_.z), d_, 5.0, chunk=None
        )
    )
    t = steady(fs, o, d)
    print(f"occl(t<5): {t:6.2f} ms  ({n/t/1e3:6.1f} Mrays/s)")


if __name__ == "__main__":
    main()
