"""Small shared sampling helpers for the integrator."""

from __future__ import annotations

import jax.numpy as jnp

from . import math3
from .random import RandomTarget, random_2d
from .sky import SUN_ANGULAR_RADIUS


def sample_sun_direction(sun_dir, pixel_id, sample_id, depth):
    """Uniform direction in the solar cone (reference: direct_lighting.cuh
    solid-angle sun sampling)."""
    r2 = random_2d(RandomTarget.LIGHT_SUN, pixel_id, sample_id, depth)
    cos_max = jnp.cos(SUN_ANGULAR_RADIUS)
    cos_t = 1.0 - r2[..., 0] * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * r2[..., 1]
    t, b = math3.orthonormal_basis(sun_dir)
    return math3.normalize(
        t * (jnp.cos(phi) * sin_t)[..., None]
        + b * (jnp.sin(phi) * sin_t)[..., None]
        + sun_dir * cos_t[..., None]
    )
