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


def test_multi_layer_march_adds_radiance():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from luminary_tpu.ops.clouds import cloud_march, pack_clouds
    from luminary_tpu.ops.vec import Vec3

    cloud = active_cloud(coverage=3.0, density=3.0)
    cloud.mid.active = True
    cloud.mid.coverage = 3.0
    cl = jax.device_put(pack_clouds(cloud))
    n = 256
    xs = np.random.default_rng(5).random((n, 2)).astype(np.float32) * 6000
    o = Vec3(jnp.asarray(xs[:, 0]), jnp.zeros((n,)), jnp.asarray(xs[:, 1]))
    up = Vec3(jnp.zeros((n,)), jnp.ones((n,)), jnp.zeros((n,)))
    sun = Vec3(jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0))
    amb = (jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)))
    sunr = jnp.asarray([18000.0] * 3)
    (r1, _, _), t1 = cloud_march(cl, o, up, sun, sunr, amb, steps=24,
                                 layers=(0,))
    (r2, _, _), t2 = cloud_march(cl, o, up, sun, sunr, amb, steps=24,
                                 layers=(0, 1))
    assert float(jnp.mean(r2)) >= float(jnp.mean(r1)) - 1e-6
    assert float(jnp.mean(t2)) <= float(jnp.mean(t1)) + 1e-6
    assert float(jnp.mean(t2)) < float(jnp.mean(t1))  # mid layer absorbs


def test_cloud_sun_transmittance_shadows_ground():
    import jax
    import jax.numpy as jnp

    from luminary_tpu.ops.clouds import cloud_sun_transmittance, pack_clouds
    from luminary_tpu.ops.vec import Vec3

    cl = jax.device_put(pack_clouds(active_cloud(coverage=4.0, density=5.0)))
    n = 256
    rngx = jnp.linspace(-4000.0, 4000.0, n)
    pos = Vec3(rngx, jnp.zeros((n,)), rngx * 0.37)
    up_sun = Vec3(jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0))
    tr = cloud_sun_transmittance(cl, pos, up_sun, layers=(0,), steps=4)
    tr = jnp.asarray(tr)
    assert float(tr.min()) >= 0.0 and float(tr.max()) <= 1.0 + 1e-6
    assert float(tr.mean()) < 0.999  # dense deck casts real shadows
    # sun pointing DOWN from the ground: no layer span → fully lit
    dn = Vec3(jnp.float32(0.0), jnp.float32(-1.0), jnp.float32(0.0))
    tr2 = cloud_sun_transmittance(cl, pos, dn, layers=(0,), steps=4)
    assert float(jnp.min(tr2)) > 0.9999
