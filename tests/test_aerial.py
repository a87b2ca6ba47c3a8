"""Aerial perspective (reference: per-depth SKY_INSCATTERING pass).

Contract: distant geometry hazes — transmittance falls and inscatter rises
with segment length, and a black wall tens of km away renders sky-tinted
instead of black.
"""

import numpy as np

from luminary_tpu.scene.entities import Material, SkyMode
from luminary_tpu.scene.mesh import Mesh
from luminary_tpu.scene.scene import Scene


def _wall_scene(dist_m, width=16, height=16, aerial=True):
    scene = Scene()
    scene.add_material(Material(albedo=(0.0, 0.0, 0.0, 1.0), roughness=1.0))
    s = 5e4  # huge black wall so every ray hits it (camera faces -z)
    verts = [(-s, -s, -dist_m), (s, -s, -dist_m), (s, s, -dist_m),
             (-s, s, -dist_m)]
    tris = [[0, 2, 1], [0, 3, 2]]
    mesh = Mesh(
        vertices=np.asarray(verts, np.float32),
        triangles=np.asarray(tris, np.int32),
        material_ids=np.zeros(2, np.uint16),
        name="wall",
    )
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)
    sky = scene.get_entity("sky")
    sky.mode = SkyMode.DEFAULT
    sky.altitude = 0.8
    scene.set_entity("sky", sky)
    st = scene.get_entity("settings")
    st.width = width
    st.height = height
    st.max_ray_depth = 2
    st.aerial_perspective = aerial
    scene.set_entity("settings", st)
    cam = scene.get_entity("camera")
    cam.pos = (0.0, 1.5, 0.0)
    cam.rotation = (0.0, 0.0, 0.0)
    scene.set_entity("camera", cam)
    return scene


def _mean(scene, samples=8):
    from luminary_tpu.render.renderer import Renderer

    r = Renderer(scene, chunk=1 << 20)
    r.render_samples(samples)
    acc = r.accum
    n = np.asarray(acc.sample_count, np.float64)
    return np.asarray(acc.radiance, np.float64).mean(axis=0) / n.mean()


def test_aerial_fetch_monotone():
    import jax.numpy as jnp

    from luminary_tpu.ops.sky import aerial_fetch
    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.render.device_scene import pack_sky

    ds = pack_sky(_wall_scene(1000.0))
    assert ds.aerial_rows.shape[0] > 1
    n = 4
    d = Vec3(jnp.full((n,), 1.0), jnp.zeros((n,)), jnp.zeros((n,)))
    dists = jnp.asarray([0.1, 1.0, 10.0, 60.0])
    (tr, tg, tb), (ir, ig, ib) = aerial_fetch(ds, d, dists)
    tr = np.asarray(tr)
    ir = np.asarray(ir)
    ib = np.asarray(ib)
    assert np.all(np.diff(tr) < 0)        # extinction grows with distance
    assert np.all(np.diff(ir) > 0)        # inscatter grows with distance
    assert ib[-1] > ir[-1] * 0.5          # rayleigh: strong blue component


def test_distant_wall_hazes():
    near = _mean(_wall_scene(100.0))
    far = _mean(_wall_scene(40_000.0))
    off = _mean(_wall_scene(40_000.0, aerial=False))
    # the black wall 40 km out picks up sky-colored haze
    assert far.mean() > max(near.mean() * 5.0, 0.01), (near, far)
    assert far.mean() > off.mean() * 5.0, (far, off)
    # haze is blue-tinted (clear-sky rayleigh)
    assert far[2] > far[0], far
