"""Ocean water in-scattering (reference: cuda/volume.cuh ocean volume —
Jerlov scalar scattering + the molecular/particle phase mixture of
ocean_utils.cuh:355-433)."""

import numpy as np
import jax.numpy as jnp
import pytest

from luminary_tpu.ops.vec import Vec3
from luminary_tpu.ops.volume import (
    JERLOV_MOLECULAR_WEIGHT,
    WATER_PARTICLE_G,
    ocean_phase,
    pack_water,
    sample_ocean_phase_direction,
    sample_water_collision,
)
from luminary_tpu.render.renderer import Renderer
from luminary_tpu.scene.entities import JerlovWaterType, Ocean
from luminary_tpu.testing import sun_plane_scene


def make_water(water_type=JerlovWaterType.I, height=0.0):
    return pack_water(Ocean(active=True, height=height,
                            water_type=water_type))


def test_ocean_phase_normalized():
    """∫ phase dω = 1 for clear (molecular) and turbid (particle) types."""
    n = 1 << 14
    cos_t = jnp.linspace(-1.0, 1.0, n)
    for wt in (JerlovWaterType.I, JerlovWaterType.II, JerlovWaterType.C9):
        w = make_water(wt)
        p = np.asarray(ocean_phase(cos_t, w))
        total = (p * 2 * np.pi * (2.0 / n)).sum()
        assert abs(total - 1.0) < 0.02, f"{wt}: {total}"


def test_ocean_phase_sampling_mean_cosine():
    """E[cos θ] of mixture samples = (1 − mol_w) · 0.924."""
    n = 1 << 17
    z = jnp.zeros((n,))
    w_in = Vec3(z, z, jnp.ones((n,)))
    pid = jnp.arange(n, dtype=jnp.uint32)
    for wt in (JerlovWaterType.IA, JerlovWaterType.III):
        w = make_water(wt)
        d = sample_ocean_phase_direction(w_in, w, pid, 0, 0)
        expected = (1.0 - JERLOV_MOLECULAR_WEIGHT[int(wt)]) * WATER_PARTICLE_G
        assert float(jnp.mean(d.z)) == pytest.approx(expected, abs=0.02)


def test_water_collision_rate_matches_beer_lambert():
    """P(collision before L) = 1 − exp(−σ_s L) for an underwater segment."""
    w = make_water(JerlovWaterType.C9)  # σ_s = 0.115, the largest
    n = 1 << 16
    z = jnp.zeros((n,))
    o = Vec3(z, jnp.full((n,), -5.0), z)
    d = Vec3(jnp.ones((n,)), z, z)  # horizontal: stays underwater
    pid = jnp.arange(n, dtype=jnp.uint32)
    L = 20.0
    coll, t_s = sample_water_collision(w, o, d, jnp.full((n,), L), pid, 0, 0)
    rate = float(jnp.mean(coll.astype(jnp.float32)))
    expected = 1.0 - np.exp(-0.115 * L)
    assert rate == pytest.approx(expected, abs=0.01)
    # collision points lie inside the segment
    ts = np.asarray(t_s)[np.asarray(coll)]
    assert ts.min() >= 0.0 and ts.max() <= L
    # above water: never collides
    o2 = Vec3(z, jnp.full((n,), 5.0), z)
    coll2, _ = sample_water_collision(w, o2, d, jnp.full((n,), L), pid, 0, 0)
    assert not bool(jnp.any(coll2))


def test_water_scatter_render_underwater():
    """An underwater camera in turbid water: in-scattering lights lanes that
    absorption-only leaves dark, and the image stays finite."""
    scene = sun_plane_scene(16, 16)
    oc = scene.get_entity("ocean")
    oc.active = True
    oc.height = 30.0  # camera (y≈?) well below the surface
    oc.amplitude = 0.05
    oc.water_type = JerlovWaterType.C9  # strongest scattering
    scene.set_entity("ocean", oc)
    cam = scene.get_entity("camera")
    cam.pos = (0.0, 2.0, -1.0)  # underwater, looking at the lit plane
    scene.set_entity("camera", cam)
    r = Renderer(scene, chunk=256)
    assert r.config.water_scatter
    r.render_samples(8)
    rad = r.get_radiance()
    assert np.all(np.isfinite(rad))
    assert rad.mean() > 0.0
