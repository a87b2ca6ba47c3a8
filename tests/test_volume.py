"""Fog volume tests (reference: cuda/volume.cuh fog behavior)."""

import numpy as np
import jax.numpy as jnp
import pytest

from luminary_tpu.ops.volume import (
    DeviceFog,
    fog_segment,
    fog_transmittance,
    hg_phase,
    pack_fog,
    sample_hg_direction,
)
from luminary_tpu.ops.vec import Vec3
from luminary_tpu.render.renderer import Renderer
from luminary_tpu.scene.entities import Fog
from luminary_tpu.testing import sun_plane_scene


def make_fog(density=1.0, height=100.0, dist=1000.0):
    return pack_fog(Fog(active=True, density=density, height=height, dist=dist))


def test_hg_phase_normalized():
    """∫ phase dω = 1 over the sphere."""
    for g in (0.0, 0.4, 0.8):
        n = 2048
        cos_t = np.linspace(-1, 1, n)
        p = np.asarray(hg_phase(jnp.asarray(cos_t), jnp.asarray(g)))
        total = (p * 2 * np.pi * (2.0 / n)).sum()
        assert abs(total - 1.0) < 0.02, f"g={g}: {total}"


def test_hg_sampling_mean_cosine():
    """E[cos θ] of HG samples equals g."""
    n = 65536
    z = jnp.zeros((n,))
    w = Vec3(z, z, jnp.ones((n,)))
    pid = jnp.arange(n, dtype=jnp.uint32)
    for g in (0.3, 0.7):
        d = sample_hg_direction(w, jnp.asarray(g), pid, 0, 0)
        mean_cos = float(jnp.mean(d.z))
        assert abs(mean_cos - g) < 0.02, f"g={g}: {mean_cos}"


def v3(x, y, z):
    return Vec3(jnp.asarray([x]), jnp.asarray([y]), jnp.asarray([z]))


def test_fog_segment_inside_looking_up():
    fog = make_fog(height=10.0)
    o = v3(0.0, 5.0, 0.0)
    d = v3(0.0, 1.0, 0.0)
    t0, t1 = fog_segment(fog, o, d, jnp.asarray([100.0]))
    assert float(t0[0]) == 0.0
    assert float(t1[0]) == pytest.approx(5.0)


def test_fog_segment_above_looking_down():
    fog = make_fog(height=10.0)
    o = v3(0.0, 20.0, 0.0)
    d = v3(0.0, -1.0, 0.0)
    t0, t1 = fog_segment(fog, o, d, jnp.asarray([100.0]))
    assert float(t0[0]) == pytest.approx(10.0)
    assert float(t1[0]) == pytest.approx(100.0)


def test_fog_transmittance_decreases_with_density():
    o = v3(0.0, 1.0, 0.0)
    d = v3(1.0, 0.0, 0.0)
    t_thin = fog_transmittance(make_fog(0.5), o, d, jnp.asarray([100.0]))
    t_thick = fog_transmittance(make_fog(5.0), o, d, jnp.asarray([100.0]))
    assert float(t_thick[0]) < float(t_thin[0]) < 1.0


def test_fog_render_attenuates_and_glows():
    """With fog on, distant ground darkens (extinction) and the image stays
    finite and energy-plausible (inscatter replaces some attenuation)."""
    scene = sun_plane_scene(24, 24)
    r0 = Renderer(scene, chunk=576)
    r0.render_samples(16)
    clear = r0.get_radiance()

    fog = scene.get_entity("fog")
    fog.active = True
    fog.density = 30.0
    fog.height = 50.0
    fog.dist = 500.0
    scene.set_entity("fog", fog)
    r0.update()
    assert r0.sample_count == 0  # fog change restarts integration
    r0.render_samples(16)
    foggy = r0.get_radiance()

    assert np.all(np.isfinite(foggy))
    # horizon-ward ground rows lose direct sun energy through extinction
    assert foggy[14:18, :, 0].mean() != pytest.approx(clear[14:18, :, 0].mean(), rel=0.02)
    assert foggy.mean() > 0.002  # inscatter keeps the image lit
