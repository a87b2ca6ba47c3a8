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
    assert np.abs(corners).max() <= 5.5  # inside the scaled cube (+size)


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
    scene = sun_plane_scene(16, 16)
    p = scene.get_entity("particles")
    p.active = True
    p.count = 500
    p.scale = 8.0
    p.size = 20.0
    scene.set_entity("particles", p)
    r = Renderer(scene, chunk=256)
    r.render_samples(4)
    rad = r.get_radiance()
    assert np.all(np.isfinite(rad))
