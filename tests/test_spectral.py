"""Full-path spectral rendering (reference: spectral.cuh + 8-λ sky.cuh).

Contracts: (a) neutral scenes render identically in spectral and RGB modes
(white-furnace consistency of the uplift/resolve round trip); (b) colored
scenes agree closely; (c) the 8-band atmosphere reddens the low sun; (d)
dispersive glass produces wavelength-dependent refraction without losing
energy.
"""

import numpy as np
import pytest

from luminary_tpu.scene.entities import Material, SkyMode
from luminary_tpu.scene.mesh import Mesh
from luminary_tpu.scene.scene import Scene


def _floor_scene(albedo, spectral, width=20, height=20, sky_color=(1, 1, 1)):
    scene = Scene()
    scene.add_material(Material(albedo=albedo, roughness=1.0))
    verts = [(-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20)]
    tris = [[0, 1, 2], [0, 2, 3]]
    mesh = Mesh(
        vertices=np.asarray(verts, np.float32),
        triangles=np.asarray(tris, np.int32),
        material_ids=np.zeros(2, np.uint16),
        name="floor",
    )
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)
    sky = scene.get_entity("sky")
    sky.mode = SkyMode.CONSTANT_COLOR
    sky.constant_color = sky_color
    scene.set_entity("sky", sky)
    s = scene.get_entity("settings")
    s.width = width
    s.height = height
    s.max_ray_depth = 3
    s.spectral_rendering = spectral
    scene.set_entity("settings", s)
    cam = scene.get_entity("camera")
    cam.pos = (0.0, 4.0, 0.0)
    cam.rotation = (-np.pi / 2, 0.0, 0.0)
    scene.set_entity("camera", cam)
    return scene


def _mean_rgb(scene, samples=64):
    from luminary_tpu.render.renderer import Renderer

    r = Renderer(scene, chunk=1 << 20)
    r.render_samples(samples)
    acc = r.accum
    n = np.asarray(acc.sample_count, np.float64)
    return np.asarray(acc.radiance, np.float64).mean(axis=0) / n.mean()


def test_spectral_white_furnace_matches_rgb():
    m_rgb = _mean_rgb(_floor_scene((1.0, 1.0, 1.0, 1.0), False))
    m_spec = _mean_rgb(_floor_scene((1.0, 1.0, 1.0, 1.0), True))
    assert np.all(np.abs(m_spec - m_rgb) / np.maximum(m_rgb, 1e-9) < 0.03), (
        m_spec, m_rgb)


def test_spectral_colored_scene_agrees():
    alb = (0.7, 0.35, 0.15, 1.0)
    m_rgb = _mean_rgb(_floor_scene(alb, False), samples=96)
    m_spec = _mean_rgb(_floor_scene(alb, True), samples=96)
    # uplift/resolve round trip is ~exact for primaries but colored
    # multi-bounce transport differs slightly by construction
    assert np.all(np.abs(m_spec - m_rgb) / np.maximum(m_rgb, 1e-2) < 0.12), (
        m_spec, m_rgb)


def test_spectral_sky_reddens_low_sun():
    """8-band atmosphere: the transmitted solar disc must redden toward the
    horizon much more strongly than at the zenith (λ^-4 Rayleigh)."""
    from luminary_tpu.render.device_scene import pack_sky

    def disc_ratio(altitude):
        scene = _floor_scene((1, 1, 1, 1), True)
        sky = scene.get_entity("sky")
        sky.mode = SkyMode.DEFAULT
        sky.altitude = altitude
        scene.set_entity("sky", sky)
        ds = pack_sky(scene)
        assert ds.env_spec_rows.shape[0] > 1  # spectral bake happened
        spec = np.asarray(ds.sun_disc_spec)
        # red end (bands 5-7, ~614-700nm) vs blue end (bands 0-2)
        return spec[5:].sum() / max(spec[:3].sum(), 1e-12)

    high = disc_ratio(1.2)
    low = disc_ratio(0.06)
    assert low > 3.0 * high, (low, high)


def test_spectral_dispersion_conserves_energy():
    scene = _floor_scene((0.9, 0.9, 0.9, 1.0), True)
    # glass slab over the floor with strong dispersion
    from luminary_tpu.scene.entities import MaterialBaseSubstrate

    glass = Material(
        albedo=(1.0, 1.0, 1.0, 1.0), roughness=0.02,
        base_substrate=MaterialBaseSubstrate.TRANSLUCENT,
        refraction_index=1.5, abbe=20.0,
    )
    scene.add_material(glass)
    verts = [(-2, 1.0, -2), (2, 1.0, -2), (2, 1.0, 2), (-2, 1.0, 2),
             (-2, 1.4, -2), (2, 1.4, -2), (2, 1.4, 2), (-2, 1.4, 2)]
    tris = [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7]]
    mesh = Mesh(
        vertices=np.asarray(verts, np.float32),
        triangles=np.asarray(tris, np.int32),
        material_ids=np.ones(4, np.uint16),
        name="slab",
    )
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)
    m = _mean_rgb(scene, samples=48)
    assert np.all(np.isfinite(m)) and np.all(m >= 0)
    assert m.mean() > 0.2  # light still reaches the floor through the slab
