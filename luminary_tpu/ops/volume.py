"""Participating media: height fog (and the shared volume sampling core).

Reference: src/luminary/device/cuda/volume.cuh, volume_utils.cuh —
homogeneous fog with closed-form (analog) distance tracking, Henyey-
Greenstein phase, and explicit transmittance on shadow rays. Ocean water
(Jerlov types) reuses the same machinery with absorption-dominant
coefficients (ops/ocean.py when the ocean lands).

Model: scatter-only-plus-absorption homogeneous medium filling y < height.
Analog tracking importance-samples collisions exactly, so pass-through and
emission-through-fog need no explicit weights; only NEE shadow rays multiply
in the segment transmittance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .random import RandomTarget, random_1d, random_2d
from .vec import Vec3, normalize as vnormalize, orthonormal_basis as vonb


class DeviceFog(NamedTuple):
    active: jnp.ndarray  # bool scalar
    sigma_t: jnp.ndarray  # f32 extinction (1/m)
    scatter_albedo: jnp.ndarray  # f32 single-scatter albedo
    height: jnp.ndarray  # f32 fog top (world y)
    max_dist: jnp.ndarray  # f32 lateral extent (reference fog.dist)
    g: jnp.ndarray  # f32 HG anisotropy


# Density unit scale: reference fog density 1.0 ≈ light haze over ~500 m.
_FOG_DENSITY_SCALE = 0.002


def pack_fog(fog) -> DeviceFog:
    # Droplet diameter (µm) → anisotropy: bigger droplets scatter forward.
    g = float(jnp.clip(0.3 + 0.25 * jnp.log10(max(fog.droplet_diameter, 0.1)), 0.0, 0.9))
    import numpy as _np

    return DeviceFog(
        active=_np.bool_(bool(fog.active)),
        sigma_t=_np.float32(fog.density * _FOG_DENSITY_SCALE),
        scatter_albedo=_np.float32(0.98),
        height=_np.float32(fog.height),
        max_dist=_np.float32(fog.dist),
        g=_np.float32(g),
    )


def hg_phase(cos_theta, g):
    g2 = g * g
    return (1.0 - g2) / (
        4.0 * jnp.pi * jnp.power(jnp.maximum(1.0 + g2 - 2.0 * g * cos_theta, 1e-6), 1.5)
    )


def sample_hg_direction(w_in: Vec3, g, pixel_id, sample_id, depth,
                        bn=None) -> Vec3:
    """Sample the HG phase about the incoming propagation direction w_in."""
    r2 = random_2d(RandomTarget.VOLUME_PHASE, pixel_id, sample_id, depth,
                   bn=bn)
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sq = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * r2[..., 0])
    cos_t = (1.0 + g_safe * g_safe - sq * sq) / (2.0 * g_safe)
    cos_t = jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * r2[..., 0], cos_t)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * r2[..., 1]
    t, b = vonb(w_in)
    a1 = jnp.cos(phi) * sin_t
    a2 = jnp.sin(phi) * sin_t
    return vnormalize(Vec3(
        t.x * a1 + b.x * a2 + w_in.x * cos_t,
        t.y * a1 + b.y * a2 + w_in.y * cos_t,
        t.z * a1 + b.z * a2 + w_in.z * cos_t,
    ))


def fog_segment(fog: DeviceFog, origin: Vec3, direction: Vec3, t_limit):
    """Overlap [t0, t1] of a ray with the fog slab (y < height), clamped to
    [0, t_limit]. Returns (t0, t1) with t1 <= t0 when no overlap."""
    oy = origin.y
    dy = direction.y
    dy_safe = jnp.where(jnp.abs(dy) < 1e-9, 1e-9, dy)
    t_plane = (fog.height - oy) / dy_safe
    inside = oy < fog.height
    # entering: outside and moving down; leaving: inside and moving up
    t0 = jnp.where(inside, 0.0, jnp.where(dy < 0.0, t_plane, jnp.inf))
    t1 = jnp.where(inside, jnp.where(dy > 0.0, t_plane, t_limit), t_limit)
    t0 = jnp.clip(t0, 0.0, t_limit)
    t1 = jnp.clip(jnp.minimum(t1, fog.max_dist + t0), 0.0, t_limit)
    active = jnp.broadcast_to(fog.active & (fog.sigma_t > 0.0), oy.shape)
    t1 = jnp.where(active, t1, 0.0)
    return t0, t1


def fog_transmittance(fog: DeviceFog, origin, direction, dist):
    """exp(-σ_t · overlap) along a (shadow) segment."""
    t0, t1 = fog_segment(fog, origin, direction, dist)
    return jnp.exp(-fog.sigma_t * jnp.maximum(t1 - t0, 0.0))


def sample_fog_collision(fog: DeviceFog, origin, direction, t_surface,
                         pixel_id, sample_id, depth):
    """Analog distance sampling inside the fog overlap.

    Returns (collision [N] bool, t_scatter [N]).
    """
    t0, t1 = fog_segment(fog, origin, direction, t_surface)
    r = random_1d(RandomTarget.VOLUME_DISTANCE, pixel_id, sample_id, depth)
    free_path = -jnp.log(jnp.maximum(1.0 - r, 1e-10)) / jnp.maximum(fog.sigma_t, 1e-10)
    t_s = t0 + free_path
    collision = (t1 > t0) & (t_s < t1)
    return collision, jnp.where(collision, t_s, t_surface)

class DeviceWater(NamedTuple):
    """Ocean water body below `height` (reference: Jerlov water types,
    cuda/volume.cuh ocean medium). Absorption-only medium — exact
    exponential transmittance per segment — plus the procedural-surface
    parameters the caustic connection sampler needs (ops/procedural.py
    ocean_height_normal_jnp; reference caustics.cuh)."""

    active: jnp.ndarray  # bool scalar
    absorb: jnp.ndarray  # f32 [3] absorption 1/m
    height: jnp.ndarray  # f32 mean water surface y
    amplitude: jnp.ndarray  # f32 wave amplitude
    frequency: jnp.ndarray  # f32 wave frequency
    ior: jnp.ndarray  # f32 water refraction index
    caustics_scale: jnp.ndarray  # f32 connection-disk scale


def pack_water(ocean) -> "DeviceWater":
    import numpy as _np

    from .procedural import JERLOV_COEFFS

    absorb, _scatter = JERLOV_COEFFS[int(ocean.water_type)]
    return DeviceWater(
        active=_np.bool_(bool(ocean.active)),
        absorb=_np.asarray(absorb, _np.float32),
        height=_np.float32(ocean.height),
        amplitude=_np.float32(ocean.amplitude),
        frequency=_np.float32(ocean.frequency),
        ior=_np.float32(ocean.refractive_index),
        caustics_scale=_np.float32(
            getattr(ocean, "caustics_domain_scale", 0.5)),
    )


def water_transmittance(water: "DeviceWater", origin: Vec3, direction: Vec3, dist):
    """exp(-σ_a · overlap) of a segment with the water half-space
    (y < water.height). Returns (tr, tg, tb) channel arrays."""
    oy = origin.y
    dy = direction.y
    dy_safe = jnp.where(jnp.abs(dy) < 1e-9, 1e-9, dy)
    t_plane = (water.height - oy) / dy_safe
    inside = oy < water.height
    t0 = jnp.where(inside, 0.0, jnp.where(dy < 0.0, t_plane, jnp.inf))
    t1 = jnp.where(inside, jnp.where(dy > 0.0, t_plane, dist), dist)
    t0 = jnp.clip(t0, 0.0, dist)
    t1 = jnp.clip(t1, 0.0, dist)
    overlap = jnp.maximum(t1 - t0, 0.0)
    overlap = jnp.where(water.active, overlap, 0.0)
    return (
        jnp.exp(-water.absorb[0] * overlap),
        jnp.exp(-water.absorb[1] * overlap),
        jnp.exp(-water.absorb[2] * overlap),
    )
