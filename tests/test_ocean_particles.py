"""Ocean + particles (procedural geometry, Jerlov water)."""

import numpy as np
import jax.numpy as jnp
import pytest

from luminary_tpu.ops.procedural import (
    OCEAN_INSTANCE_ID,
    generate_ocean_mesh,
    generate_particles,
    ocean_fbm,
)
from luminary_tpu.ops.vec import Vec3
from luminary_tpu.ops.volume import pack_water, water_transmittance
from luminary_tpu.render.renderer import Renderer
from luminary_tpu.scene.entities import JerlovWaterType, Ocean, Particles
from luminary_tpu.testing import sun_plane_scene


def test_fbm_bounded_and_smooth():
    x = np.linspace(-10, 10, 256)
    z = np.linspace(-10, 10, 256)
    gx, gz = np.meshgrid(x, z)
    h = ocean_fbm(gx, gz)
    assert np.all(np.abs(h) < 1.0)
    assert h.std() > 0.01  # not constant
    # continuity: neighboring samples close
    assert np.abs(np.diff(h, axis=0)).max() < 0.3


def test_ocean_mesh_generation():
    oc = Ocean(active=True, height=2.0, amplitude=0.5, frequency=0.2)
    corners, normals = generate_ocean_mesh(oc, resolution=32)
    assert corners.shape == (32 * 32 * 2, 3, 3)
    ys = corners[..., 1]
    assert abs(ys.mean() - 2.0) < 0.2
    assert np.all(np.abs(ys - 2.0) <= 0.5 + 1e-5)
    lens = np.linalg.norm(normals, axis=-1)
    assert np.allclose(lens, 1.0, atol=1e-4)
    assert normals[..., 1].min() > 0.0  # heightfield normals point up


def test_particles_generation():
    p = Particles(active=True, count=100, scale=10.0, size=1.0, seed=3)
    corners, normals = generate_particles(p)
    assert corners.shape == (200, 3, 3)  # 2 tris per quad
    # tile coordinates [0, scale)³ (+ quad half-size margin)
    assert corners.min() >= -0.5 and corners.max() <= 10.5


def test_water_transmittance_depth_colored():
    w = pack_water(Ocean(active=True, height=0.0, water_type=JerlovWaterType.II))

    def v3(x, y, z):
        return Vec3(jnp.asarray([x]), jnp.asarray([y]), jnp.asarray([z]))

    o = v3(0.0, -1.0, 0.0)
    d = v3(1.0, 0.0, 0.0)
    t10 = np.asarray(water_transmittance(w, o, d, jnp.asarray([10.0])))[:, 0]
    t50 = np.asarray(water_transmittance(w, o, d, jnp.asarray([50.0])))[:, 0]
    assert np.all(t50 < t10)
    # blue channel is absorbed most in our coefficient table
    assert t10[2] < t10[0]
    # above water: no attenuation
    o2 = v3(0.0, 5.0, 0.0)
    t_above = np.asarray(water_transmittance(w, o2, d, jnp.asarray([10.0])))[:, 0]
    assert np.allclose(t_above, 1.0)


def test_ocean_scene_renders():
    scene = sun_plane_scene(16, 16)
    oc = scene.get_entity("ocean")
    oc.active = True
    oc.height = 0.5
    oc.amplitude = 0.2
    scene.set_entity("ocean", oc)
    r = Renderer(scene, chunk=256)
    r.render_samples(4)
    rad = r.get_radiance()
    assert np.all(np.isfinite(rad))
    # center-bottom pixel should hit the ocean surface (instance id marker)
    found_ocean = False
    for y in range(10, 16):
        info = r.get_pixel_info(8, y)
        if info["instance_id"] == OCEAN_INSTANCE_ID:
            found_ocean = True
            break
    assert found_ocean, "ocean surface not visible in gbuffer"


def test_particles_scene_renders():
    """Particle tier: visible on primaries (gbuffer id), phase-scattered,
    finite; motion (speed > 0) perturbs the image (per-sample time)."""
    def build(speed):
        scene = sun_plane_scene(16, 16)
        p = scene.get_entity("particles")
        p.active = True
        p.count = 500
        p.scale = 8.0
        p.size = 30.0
        p.speed = speed
        scene.set_entity("particles", p)
        return scene

    r = Renderer(build(0.0), chunk=256)
    r.render_samples(4)
    rad = r.get_radiance()
    assert np.all(np.isfinite(rad))
    # a dense field of big particles must show up in the primary gbuffer
    from luminary_tpu.ops.procedural import PARTICLES_INSTANCE_ID

    ids = {r.get_pixel_info(x, y)["instance_id"]
           for x in range(0, 16, 2) for y in range(0, 16, 2)}
    assert PARTICLES_INSTANCE_ID in ids, ids
    # motion blur: a fast field samples different tile offsets per sample
    r2 = Renderer(build(200.0), chunk=256)
    r2.render_samples(4)
    rad2 = r2.get_radiance()
    assert np.all(np.isfinite(rad2))
    assert not np.allclose(rad, rad2)


# ---- analytic ocean tier (ops/ocean.py; reference: ocean_utils.cuh) ----


def _water(amplitude=0.2, height=0.0, frequency=0.12):
    return pack_water(Ocean(active=True, height=height, amplitude=amplitude,
                            frequency=frequency))


def _vecn(n, x, y, z):
    return Vec3(jnp.full((n,), x, jnp.float32), jnp.full((n,), y, jnp.float32),
                jnp.full((n,), z, jnp.float32))


def test_ocean_intersect_hits_heightfield():
    from luminary_tpu.ops.ocean import ocean_intersect
    from luminary_tpu.ops.procedural import ocean_height_normal_jnp

    w = _water(amplitude=0.3, height=1.0)
    n = 64
    xs = jnp.linspace(-20.0, 20.0, n)
    o = Vec3(xs, jnp.full((n,), 6.0), xs * 0.5)
    d = _vecn(n, 0.0, -1.0, 0.0)
    act = jnp.ones((n,), bool)
    found, t = ocean_intersect(w, o, d, jnp.full((n,), 1e6), act)
    assert np.asarray(found).all()
    y_hit = 6.0 - np.asarray(t)
    y_true, _ = ocean_height_normal_jnp(w, o.x, o.z)
    np.testing.assert_allclose(y_hit, np.asarray(y_true), atol=2e-2)


def test_ocean_intersect_from_below_and_misses():
    from luminary_tpu.ops.ocean import ocean_intersect

    w = _water(amplitude=0.3, height=1.0)
    n = 32
    act = jnp.ones((n,), bool)
    # from below, pointing up: hit near the surface
    o = _vecn(n, 3.0, -4.0, 7.0)
    d = _vecn(n, 0.0, 1.0, 0.0)
    found, t = ocean_intersect(w, o, d, jnp.full((n,), 1e6), act)
    assert np.asarray(found).all()
    assert np.all(np.abs(-4.0 + np.asarray(t) - 1.0) < 0.4)
    # above the band, pointing up: never hits
    o2 = _vecn(n, 0.0, 2.0, 0.0)
    found2, _ = ocean_intersect(w, o2, d, jnp.full((n,), 1e6), act)
    assert not np.asarray(found2).any()
    # t_max short of the band: no hit
    o3 = _vecn(n, 0.0, 6.0, 0.0)
    d3 = _vecn(n, 0.0, -1.0, 0.0)
    found3, _ = ocean_intersect(w, o3, d3, jnp.full((n,), 2.0), act)
    assert not np.asarray(found3).any()


def test_ocean_crosses_sign_change_semantics():
    from luminary_tpu.ops.ocean import ocean_crosses
    from luminary_tpu.ops.procedural import ocean_height_normal_jnp

    w = _water(amplitude=0.2, height=0.0)
    n = 16
    act = jnp.ones((n,), bool)
    # vertical crossing segment: must detect
    o = _vecn(n, 1.0, -3.0, 2.0)
    up = _vecn(n, 0.0, 1.0, 0.0)
    assert np.asarray(ocean_crosses(w, o, up, jnp.full((n,), 6.0), act)).all()
    # entirely above the band: no crossing
    o2 = _vecn(n, 1.0, 1.0, 2.0)
    assert not np.asarray(
        ocean_crosses(w, o2, up, jnp.full((n,), 6.0), act)).any()
    # segment from underwater ENDING exactly on the surface (caustic
    # connection shape): endpoint insets keep it unblocked
    y_surf, _ = ocean_height_normal_jnp(w, o.x, o.z)
    t_surf = np.asarray(y_surf)[0] - (-3.0)
    assert not np.asarray(
        ocean_crosses(w, o, up, jnp.full((n,), t_surf), act)).any()


def test_analytic_matches_tessellated_render():
    """Same ocean scene, analytic tier vs tessellated mesh: the images agree
    in energy (different discretizations of the same surface)."""

    def build(tess):
        scene = sun_plane_scene(16, 16)
        oc = scene.get_entity("ocean")
        oc.active = True
        oc.height = 0.5
        oc.amplitude = 0.2
        oc.tessellated = tess
        scene.set_entity("ocean", oc)
        return scene

    def mean(scene):
        r = Renderer(scene, chunk=256)
        r.render_samples(16)
        n = 16 * 16
        img = (np.asarray(r.accum.radiance)[:n]
               / np.asarray(r.accum.sample_count)[:n, None])
        assert np.isfinite(img).all()
        return img.mean()

    a = mean(build(False))
    b = mean(build(True))
    # the grids differ systematically: the mesh spans only ±200 units (the
    # analytic tier correctly covers the horizon) and facet normals quantize
    # the sun glints — measured ~1.3x energy at 16 spp; gate at 2x
    assert abs(a - b) / max(b, 1e-6) < 1.0, (a, b)
    assert a > 1e-4 and b > 1e-4, (a, b)


def test_analytic_ocean_no_retess_on_camera_move(monkeypatch):
    """Flying >100 units must NOT trigger a repack on the analytic tier
    (the tessellated grid's re-tessellation hitch, VERDICT r2 weak #7).
    Geometry identity can't be compared (fast_device_put rewraps the
    pytree every update) — count pack_geometry invocations instead."""
    from luminary_tpu.render import renderer as renderer_mod

    calls = []
    orig = renderer_mod.pack_geometry

    def counting(scene, topo=None):
        calls.append(1)
        out = orig(scene, topo=topo)
        counting.last_wide = getattr(orig, "last_wide", None)
        return out

    counting.last_wide = None
    monkeypatch.setattr(renderer_mod, "pack_geometry", counting)

    scene = sun_plane_scene(16, 16)
    oc = scene.get_entity("ocean")
    oc.active = True
    scene.set_entity("ocean", oc)
    r = Renderer(scene, chunk=256)
    r.render_samples(1)
    assert len(calls) == 1  # initial pack only
    cam = scene.get_entity("camera")
    cam.pos = (cam.pos[0] + 500.0, cam.pos[1], cam.pos[2])
    scene.set_entity("camera", cam)
    r.update()
    assert len(calls) == 1, "camera move repacked geometry"
    r.render_samples(1)
    assert np.isfinite(r.get_radiance()).all()
