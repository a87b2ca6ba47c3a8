"""Bridge volume NEE (reference: light_bridges.cuh).

Contract: a bridge scaled/rotated onto the light point must actually land
there segment by segment; M=1 reduces exactly to the direct connection
estimator; the fog-scene render with bridges converges to the same image as
direct volume NEE (M=1 equivalence) and stays finite/energy-sane at M=4.
"""

import jax.numpy as jnp
import numpy as np

from luminary_tpu.ops.bridges import _rotate_to, sample_bridge
from luminary_tpu.ops.vec import Vec3


def _vec(n, x, y, z):
    return Vec3(jnp.full((n,), x), jnp.full((n,), y), jnp.full((n,), z))


def test_rotation_maps_a_to_b():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(64, 3))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.normal(size=(64, 3))
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    av = Vec3(*(jnp.asarray(a[:, i]) for i in range(3)))
    bv = Vec3(*(jnp.asarray(b[:, i]) for i in range(3)))
    r = _rotate_to(av, bv, av)  # rotating a itself must give b
    out = np.stack([np.asarray(r.x), np.asarray(r.y), np.asarray(r.z)], -1)
    np.testing.assert_allclose(out, b, atol=2e-3)


def test_bridge_lands_on_light():
    n = 512
    x = _vec(n, 0.0, 1.0, 0.0)
    y = _vec(n, 3.0, 2.0, -1.0)
    view = _vec(n, 0.0, 0.0, -1.0)
    for m_max in (1, 3):
        (fd, starts, dirs, lens, wpdf, phase, m) = sample_bridge(
            x, y, view, 0.3, 0.5, 0.6, m_max,
            jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0), 0,
        )
        # walk the segments: endpoint must be the light point
        ex = np.asarray(starts[0].x) * 0.0
        ey, ez = ex.copy(), ex.copy()
        for i in range(m_max):
            live = np.asarray(i < m)
            ex = np.where(live, np.asarray(starts[i].x) + np.asarray(dirs[i].x) * np.asarray(lens[i]), ex)
            ey = np.where(live, np.asarray(starts[i].y) + np.asarray(dirs[i].y) * np.asarray(lens[i]), ey)
            ez = np.where(live, np.asarray(starts[i].z) + np.asarray(dirs[i].z) * np.asarray(lens[i]), ez)
        np.testing.assert_allclose(ex, 3.0, atol=2e-3)
        np.testing.assert_allclose(ey, 2.0, atol=2e-3)
        np.testing.assert_allclose(ez, -1.0, atol=2e-3)
        # first segment starts at x
        np.testing.assert_allclose(np.asarray(starts[0].x), 0.0, atol=1e-5)
        assert np.isfinite(np.asarray(wpdf)).all()
        assert (np.asarray(phase) > 0).all()


def test_m1_bridge_equals_direct_connection():
    """M=1: w/pdf must equal exp(-sigma_t d)/d^2 analytically."""
    n = 256
    x = _vec(n, 0.0, 0.0, 0.0)
    y = _vec(n, 0.0, 4.0, 0.0)
    view = _vec(n, 1.0, 0.0, 0.0)
    sigma_t = 0.37
    (fd, starts, dirs, lens, wpdf, phase, m) = sample_bridge(
        x, y, view, 0.2, 0.9 * sigma_t, sigma_t, 1,
        jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3), 0,
    )
    d = 4.0
    expect = np.exp(-sigma_t * d) / (d * d)
    np.testing.assert_allclose(np.asarray(wpdf), expect, rtol=1e-4)
    # and the single segment is the straight connection
    np.testing.assert_allclose(np.asarray(dirs[0].y), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lens[0]), d, rtol=1e-4)


def _fog_scene(bridge_vertices):
    from luminary_tpu.scene.entities import Material, SkyMode
    from luminary_tpu.scene.mesh import Mesh
    from luminary_tpu.scene.scene import Scene

    scene = Scene()
    scene.add_material(Material(albedo=(0.4, 0.4, 0.4, 1.0), roughness=1.0))
    scene.add_material(Material(
        albedo=(0, 0, 0, 1), emission=(40.0, 36.0, 30.0), emission_active=True,
    ))
    verts = [(-10, 0, -10), (10, 0, -10), (10, 0, 10), (-10, 0, 10),
             # emissive panel facing down at y=4
             (-1, 4, -1), (1, 4, -1), (1, 4, 1), (-1, 4, 1)]
    tris = [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]]
    mats = [0, 0, 1, 1]
    mesh = Mesh(
        vertices=np.asarray(verts, np.float32),
        triangles=np.asarray(tris, np.int32),
        material_ids=np.asarray(mats, np.uint16), name="fogbox",
    )
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)
    s = scene.get_entity("settings")
    s.width = s.height = 24
    s.max_ray_depth = 4
    s.bridge_max_num_vertices = bridge_vertices
    scene.set_entity("settings", s)
    cam = scene.get_entity("camera")
    cam.pos = (0.0, 1.5, 8.0)
    scene.set_entity("camera", cam)
    fog = scene.get_entity("fog")
    fog.active = True
    fog.density = 60.0
    fog.height = 6.0
    scene.set_entity("fog", fog)
    sky = scene.get_entity("sky")
    sky.mode = SkyMode.CONSTANT_COLOR
    sky.constant_color = (0.0, 0.0, 0.0)
    scene.set_entity("sky", sky)
    return scene


def _mean_img(scene, samples=64):
    from luminary_tpu.render.renderer import Renderer

    r = Renderer(scene, chunk=1 << 20)
    r.render_samples(samples)
    n = 24 * 24
    return (
        np.asarray(r.accum.radiance)[:n]
        / np.asarray(r.accum.sample_count)[:n, None]
    )


def test_fog_render_bridges_m1_matches_m4_energy():
    """M>=2 uses the reference's exclusive coverage (light_common.cuh:11-13):
    bridges at the first scatter vertex own orders 1..M; the forward chain
    runs no geometry NEE / collects no geometry emission afterwards. That
    drops orders >M and surface-mediated transport (slightly darker than the
    fully-MIS'd M=1), but must NOT exceed M=1 — an overshoot means the
    forward chain double-counts bridge orders again (ADVICE r2 #2).
    Calibrated at 256 spp: M=2 -> 0.81x, M=4 -> 0.89x of M=1."""
    a = _mean_img(_fog_scene(1))
    b = _mean_img(_fog_scene(4))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert a.mean() > 1e-4  # fog is lit
    assert b.mean() >= a.mean() * 0.7, (a.mean(), b.mean())
    assert b.mean() <= a.mean() * 1.15, (a.mean(), b.mean())


def test_vertex_count_importance_tracks_optical_depth():
    """The truncated-Poisson count importance (the reference LUT's analytic
    stand-in) must favor the direct order for optically thin connections
    and high orders for thick ones."""
    n = 4096
    view = _vec(n, 1.0, 0.0, 0.0)
    x = _vec(n, 0.0, 0.0, 0.0)

    def mean_m(dist, sigma_t):
        y = _vec(n, 0.0, dist, 0.0)
        (_, _, _, _, _, _, m) = sample_bridge(
            x, y, view, 0.3, 0.9 * sigma_t, sigma_t, 4,
            jnp.arange(n, dtype=jnp.uint32), jnp.uint32(1), 0,
        )
        return float(np.asarray(m).mean())

    thin = mean_m(dist=0.5, sigma_t=0.2)   # s0 = 0.1
    thick = mean_m(dist=8.0, sigma_t=2.0)  # s0 = 16
    assert thin < 1.3, thin
    assert thick > 3.3, thick
