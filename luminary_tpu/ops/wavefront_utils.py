"""Small shared sampling helpers for the integrator."""

from __future__ import annotations

import jax.numpy as jnp

from .random import RandomTarget, random_2d
from .sky import SUN_ANGULAR_RADIUS
from .vec import Vec3, normalize, orthonormal_basis


def sample_sun_direction(sun_dir: Vec3, pixel_id, sample_id, depth) -> Vec3:
    """Uniform direction in the solar cone (reference: direct_lighting.cuh
    solid-angle sun sampling)."""
    r2 = random_2d(RandomTarget.LIGHT_SUN, pixel_id, sample_id, depth)
    cos_max = jnp.cos(SUN_ANGULAR_RADIUS)
    cos_t = 1.0 - r2[..., 0] * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * r2[..., 1]
    t, b = orthonormal_basis(sun_dir)
    a1 = jnp.cos(phi) * sin_t
    a2 = jnp.sin(phi) * sin_t
    return normalize(Vec3(
        t.x * a1 + b.x * a2 + sun_dir.x * cos_t,
        t.y * a1 + b.y * a2 + sun_dir.y * cos_t,
        t.z * a1 + b.z * a2 + sun_dir.z * cos_t,
    ))
