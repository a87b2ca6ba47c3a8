"""Small shared sampling helpers for the integrator."""

from __future__ import annotations

import jax.numpy as jnp

from .random import RandomTarget, random_2d
from .sky import SUN_ANGULAR_RADIUS
from .vec import Vec3, normalize, orthonormal_basis


def sample_sun_direction(sun_dir: Vec3, pixel_id, sample_id, depth,
                         bn=None) -> Vec3:
    """Uniform direction in the solar cone (reference: direct_lighting.cuh
    solid-angle sun sampling)."""
    r2 = random_2d(RandomTarget.LIGHT_SUN, pixel_id, sample_id, depth,
                   bn=bn)
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


def _spread3(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 8 bits of x to every 3rd bit (morton interleave)."""
    x = x.astype(jnp.uint32) & jnp.uint32(0xFF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def ray_sort_key(origin: Vec3, direction: Vec3, active, bounds) -> jnp.ndarray:
    """Coherence sort key for the wavefront (reference: the tasks_sort
    counting sort, cuda/kernels.cuh:394-484 — there it bins by shading type;
    here the win is TRAVERSAL coherence, so the key is spatial).

    Layout (u32, ascending sort): dead lanes last (bit 30), then direction
    octant (bits 27-29), then a 24-bit morton code of the origin. Packets of
    16 consecutive sorted rays then walk nearly identical tree paths, and
    dead lanes collapse into all-dead trailing chunks whose while_loops exit
    immediately.
    """
    lo_x, lo_y, lo_z = bounds[0], bounds[1], bounds[2]
    inv = 255.0 / jnp.maximum(bounds[3:6] - bounds[0:3], 1e-6)

    def q(c, lo, s):
        return jnp.clip((c - lo) * s, 0.0, 255.0).astype(jnp.uint32)

    m = (
        (_spread3(q(origin.x, lo_x, inv[0])) << 2)
        | (_spread3(q(origin.y, lo_y, inv[1])) << 1)
        | _spread3(q(origin.z, lo_z, inv[2]))
    )
    octant = (
        ((direction.x < 0).astype(jnp.uint32) << 2)
        | ((direction.y < 0).astype(jnp.uint32) << 1)
        | (direction.z < 0).astype(jnp.uint32)
    )
    dead = (~active).astype(jnp.uint32)
    return (dead << 30) | (octant << 27) | (m >> 3)
