"""Rough dielectric refraction, thin-walled surfaces, medium stack.

Reference behavior targets: bsdf_utils.cuh:269 (VNDF refraction sampling),
medium_stack.cuh (nested media IOR), geometry.cuh medium transitions.
"""

import jax.numpy as jnp
import numpy as np

from luminary_tpu.ops.material import (
    make_frame,
    material_sample,
    medium_below_ior,
    medium_pop,
    medium_push,
    medium_top_ior,
)
from tests.test_ggx import make_mat, vec_tile


def _sample(mat, wo_xyz, n=4096, eta_rel=None, seed=0):
    ns = vec_tile((0.0, 0.0, 1.0), n)
    wo = vec_tile(wo_xyz, n)
    pid = jnp.arange(seed * n, (seed + 1) * n, dtype=jnp.uint32)
    fr = make_frame(mat, ns, wo)
    return material_sample(mat, fr, ns, wo, pid, 0, 0, eta_rel=eta_rel)


def test_medium_stack_roundtrip():
    m = jnp.zeros((4,), jnp.uint32)
    np.testing.assert_allclose(np.asarray(medium_top_ior(m)), 1.0)
    m1 = medium_push(m, jnp.full((4,), 1.33))  # into water
    np.testing.assert_allclose(np.asarray(medium_top_ior(m1)), 1.33, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(medium_below_ior(m1)), 1.0)
    m2 = medium_push(m1, jnp.full((4,), 1.5))  # glass inside water
    np.testing.assert_allclose(np.asarray(medium_top_ior(m2)), 1.5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(medium_below_ior(m2)), 1.33, rtol=1e-3)
    m3 = medium_pop(m2)  # back out of the glass
    np.testing.assert_allclose(np.asarray(medium_top_ior(m3)), 1.33, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(medium_below_ior(m3)), 1.0)


def test_relative_eta_bends_less_in_water():
    """Glass-in-water: relative eta 1.5/1.33 bends less than glass-in-air."""
    mat = make_mat(4096, translucent=True, ior=1.5, albedo=(1, 1, 1),
                   roughness=0.0)
    wo = (0.5, 0.0, np.sqrt(1 - 0.25))

    def mean_sin_t(eta):
        wi, w, pdf, delta, tr = _sample(
            mat, wo, eta_rel=jnp.full((4096,), eta)
        )
        tr = np.asarray(tr)
        sin_t = np.sqrt(np.asarray(wi.x)[tr] ** 2 + np.asarray(wi.y)[tr] ** 2)
        return sin_t.mean()

    s_air = mean_sin_t(1.5)
    s_water = mean_sin_t(1.5 / 1.33)
    np.testing.assert_allclose(s_air, 0.5 / 1.5, atol=1e-2)
    np.testing.assert_allclose(s_water, 0.5 / (1.5 / 1.33), atol=1e-2)
    assert s_water > s_air


def test_rough_dielectric_scatters_but_conserves():
    """Roughness spreads refraction; single-scatter energy stays in
    (0.8, 1.0] (G2/G1 weight loses some energy at high roughness — the
    reference compensates with its dielectric LUT; we bound the loss)."""
    mat = make_mat(8192, translucent=True, ior=1.5, albedo=(1, 1, 1),
                   roughness=0.4)
    wi, w, pdf, delta, tr = _sample(mat, (0.3, 0.1, 0.95), n=8192)
    tr = np.asarray(tr)
    assert 0.3 < tr.mean() <= 1.0
    sin_t = np.sqrt(np.asarray(wi.x)[tr] ** 2 + np.asarray(wi.y)[tr] ** 2)
    assert sin_t.std() > 0.02  # genuinely rough, not delta
    energy = np.asarray(w[0])
    assert 0.8 < energy.mean() <= 1.0 + 1e-5


def test_thin_walled_passes_straight_through():
    mat = make_mat(4096, translucent=True, ior=1.5, albedo=(0.9, 0.9, 0.9),
                   roughness=0.0, thin_walled=True)
    wo = (0.4, -0.2, 0.89)
    wi, w, pdf, delta, tr = _sample(mat, wo)
    tr_mask = np.asarray(wi.z) < 0  # transmitted side
    assert tr_mask.mean() > 0.5
    # transmitted direction is exactly -wo (no bend)
    won = np.asarray(vec_tile(wo, 1).x), np.asarray(vec_tile(wo, 1).y)
    np.testing.assert_allclose(np.asarray(wi.x)[tr_mask], -won[0][0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(wi.y)[tr_mask], -won[1][0], atol=1e-5)
    # thin transmission never reports a medium change
    assert not np.asarray(tr)[tr_mask].any()


def test_render_glass_sphere_scene_finite():
    """End-to-end: a rough-glass sphere over a floor renders finite and the
    medium stack survives enter/exit chains."""
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.scene.entities import Material, MaterialBaseSubstrate, SkyMode
    from luminary_tpu.scene.mesh import Mesh
    from luminary_tpu.scene.scene import Scene
    from luminary_tpu.testing import _uv_sphere

    scene = Scene()
    scene.add_material(Material(albedo=(0.6, 0.6, 0.6, 1.0), roughness=1.0))
    scene.add_material(Material(
        albedo=(1.0, 1.0, 1.0, 1.0),
        base_substrate=MaterialBaseSubstrate.TRANSLUCENT,
        refraction_index=1.5, roughness=0.15,
    ))
    fl = np.asarray([(-9, 0, -9), (9, 0, -9), (9, 0, 9), (-9, 0, 9)], np.float32)
    ft = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    sv, st = _uv_sphere(0.0, 1.2, 0.0, 1.0, nu=12, nv=8)
    verts = np.concatenate([fl, sv])
    tris = np.concatenate([ft, st + 4])
    mats = np.concatenate([
        np.zeros(2, np.uint16), np.ones(len(st), np.uint16)
    ])
    mesh = Mesh(vertices=verts, triangles=tris, material_ids=mats, name="glass")
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)
    settings = scene.get_entity("settings")
    settings.width = settings.height = 24
    settings.max_ray_depth = 6
    scene.set_entity("settings", settings)
    cam = scene.get_entity("camera")
    cam.pos = (0.0, 1.5, 4.0)
    scene.set_entity("camera", cam)
    r = Renderer(scene, chunk=1 << 20)
    r.render_samples(8)
    img = np.asarray(r.accum.radiance)
    assert np.isfinite(img).all()
    assert img.mean() > 0.0
