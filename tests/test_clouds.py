"""Procedural cloud tests (reference: cuda/cloud.cuh behavior)."""

import numpy as np
import jax.numpy as jnp
import pytest

from luminary_tpu.ops.clouds import (
    cloud_density,
    cloud_march,
    fbm3,
    pack_clouds,
    value_noise3,
)
from luminary_tpu.ops.vec import Vec3
from luminary_tpu.render.renderer import Renderer
from luminary_tpu.scene.entities import Cloud
from luminary_tpu.testing import sun_plane_scene


def active_cloud(**kw):
    c = Cloud(active=True)
    c.low.active = True
    c.low.height_min = kw.get("hmin", 1000.0)
    c.low.height_max = kw.get("hmax", 2000.0)
    c.low.coverage = kw.get("coverage", 2.0)
    c.density = kw.get("density", 1.0)
    return c


def test_noise3_range_and_variation():
    arr = np.random.default_rng(0).random((1024, 3)).astype(np.float32) * 50
    p = Vec3(jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1]), jnp.asarray(arr[:, 2]))
    v = np.asarray(value_noise3(p))
    assert v.min() >= 0 and v.max() <= 1
    assert v.std() > 0.05
    f = np.asarray(fbm3(p))
    assert f.min() >= 0 and f.max() <= 1


def test_density_confined_to_layer():
    import jax

    cl = jax.device_put(pack_clouds(active_cloud()))

    def v3(x, y, z):
        return Vec3(jnp.asarray([x]), jnp.asarray([y]), jnp.asarray([z]))

    below = v3(100.0, 100.0, -50.0)
    above = v3(100.0, 5000.0, -50.0)
    assert float(cloud_density(cl, below)[0]) == 0.0
    assert float(cloud_density(cl, above)[0]) == 0.0
    # somewhere in the layer there is cloud
    arr = (np.random.default_rng(1).random((4096, 3)) * [8000, 0, 8000]
           + [0, 1400, 0]).astype(np.float32)
    xs = Vec3(jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1]), jnp.asarray(arr[:, 2]))
    d = np.asarray(cloud_density(cl, xs))
    assert d.max() > 0.1


def test_cloud_march_attenuates_sky():
    import jax

    cl = jax.device_put(pack_clouds(active_cloud(coverage=3.0, density=3.0)))
    n = 256
    xs = np.random.default_rng(2).random((n, 2)).astype(np.float32) * 6000
    o = Vec3(jnp.asarray(xs[:, 0]), jnp.ones((n,)), jnp.asarray(xs[:, 1]))
    z = jnp.zeros((n,))
    d = Vec3(z, jnp.ones((n,)), z)  # straight up
    sun = Vec3(jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(0.0))
    amb = jnp.full((n,), 0.05)
    rad, trans = cloud_march(cl, o, d, sun, jnp.asarray([18000.0] * 3),
                             (amb, amb, amb), steps=32)
    t = np.asarray(trans)
    r = np.stack([np.asarray(c) for c in rad], -1)
    assert np.all((t >= 0) & (t <= 1))
    assert t.mean() < 0.999  # some occlusion somewhere
    assert np.all(np.isfinite(r)) and r.max() > 0  # lit clouds


def test_cloudy_scene_renders():
    scene = sun_plane_scene(16, 16)
    cloud = scene.get_entity("cloud")
    cloud.active = True
    cloud.low.active = True
    cloud.low.coverage = 2.0
    cloud.steps = 24
    scene.set_entity("cloud", cloud)
    r = Renderer(scene, chunk=256)
    r.render_samples(4)
    rad = r.get_radiance()
    assert np.all(np.isfinite(rad))
    assert rad.mean() > 0.005
