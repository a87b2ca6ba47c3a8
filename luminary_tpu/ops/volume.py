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
    cuda/volume.cuh ocean medium — RGB absorption + scalar scattering with
    the molecular/particle HG phase mixture of ocean_utils.cuh:355-433) plus
    the procedural-surface parameters the caustic connection sampler needs
    (ops/procedural.py ocean_height_normal_jnp; reference caustics.cuh)."""

    active: jnp.ndarray  # bool scalar
    absorb: jnp.ndarray  # f32 [3] absorption 1/m
    scatter: jnp.ndarray  # f32 scattering 1/m (Jerlov: gray)
    mol_weight: jnp.ndarray  # f32 molecular (g=0) phase mixture weight
    height: jnp.ndarray  # f32 mean water surface y
    amplitude: jnp.ndarray  # f32 wave amplitude
    frequency: jnp.ndarray  # f32 wave frequency
    ior: jnp.ndarray  # f32 water refraction index
    caustics_scale: jnp.ndarray  # f32 connection-disk scale


# Molecular-vs-particle phase mixture weight per Jerlov type (reference
# ocean_utils.cuh:355-380 ocean_molecular_weight): clear oceanic water
# scatters mostly molecularly (isotropic), turbid coastal water almost
# entirely by particles (HG g=0.924).
JERLOV_MOLECULAR_WEIGHT = {
    0: 0.93, 1: 0.44, 2: 0.06, 3: 0.007, 4: 0.003,
    5: 0.005, 6: 0.003, 7: 0.001, 8: 0.0, 9: 0.0,
}
WATER_PARTICLE_G = 0.924  # reference ocean_utils.cuh:391


def pack_water(ocean) -> "DeviceWater":
    import numpy as _np

    from .procedural import JERLOV_COEFFS

    absorb, scatter = JERLOV_COEFFS[int(ocean.water_type)]
    return DeviceWater(
        active=_np.bool_(bool(ocean.active)),
        absorb=_np.asarray(absorb, _np.float32),
        scatter=_np.float32(scatter),
        mol_weight=_np.float32(JERLOV_MOLECULAR_WEIGHT[int(ocean.water_type)]),
        height=_np.float32(ocean.height),
        amplitude=_np.float32(ocean.amplitude),
        frequency=_np.float32(ocean.frequency),
        ior=_np.float32(ocean.refractive_index),
        caustics_scale=_np.float32(
            getattr(ocean, "caustics_domain_scale", 0.5)),
    )


def water_segment(water: "DeviceWater", origin: Vec3, direction: Vec3, dist):
    """Overlap [t0, t1] of a segment with the water half-space
    (y < water.height, mean plane), clamped to [0, dist]."""
    oy = origin.y
    dy = direction.y
    dy_safe = jnp.where(jnp.abs(dy) < 1e-9, 1e-9, dy)
    t_plane = (water.height - oy) / dy_safe
    inside = oy < water.height
    t0 = jnp.where(inside, 0.0, jnp.where(dy < 0.0, t_plane, jnp.inf))
    t1 = jnp.where(inside, jnp.where(dy > 0.0, t_plane, dist), dist)
    t0 = jnp.clip(t0, 0.0, dist)
    t1 = jnp.clip(t1, 0.0, dist)
    t1 = jnp.where(water.active, t1, t0)
    return t0, t1


def water_transmittance(water: "DeviceWater", origin: Vec3, direction: Vec3,
                        dist, with_scatter: bool = False):
    """exp(-σ_a · overlap) of a segment with the water half-space
    (y < water.height). Returns (tr, tg, tb) channel arrays.

    with_scatter=True folds the scattering extinction exp(-σ_s · overlap)
    in as well — the FULL transmittance for NEE shadow segments when water
    in-scattering is on (traveled segments must NOT use it: the analog
    collision sampler already accounts for σ_s exactly)."""
    t0, t1 = water_segment(water, origin, direction, dist)
    overlap = jnp.maximum(t1 - t0, 0.0)
    s = water.scatter if with_scatter else 0.0
    return (
        jnp.exp(-(water.absorb[0] + s) * overlap),
        jnp.exp(-(water.absorb[1] + s) * overlap),
        jnp.exp(-(water.absorb[2] + s) * overlap),
    )


def sample_water_collision(water: "DeviceWater", origin, direction, t_surface,
                           pixel_id, sample_id, depth, bn=None):
    """Analog scattering-distance sampling inside the water overlap
    (reference volume_sample_intersection, volume_utils.cuh:176-187, with
    the ocean preset's scalar scattering). Scatter-only tracking: the event
    weight is exactly 1 and absorption is applied separately per segment.

    Returns (collision [N] bool, t_scatter [N])."""
    t0, t1 = water_segment(water, origin, direction, t_surface)
    # dk offset 64 keeps the stream disjoint from fog's (dk=depth) for any
    # realistic max_depth
    r = random_1d(RandomTarget.VOLUME_DISTANCE, pixel_id, sample_id,
                  depth + 64, bn=bn)
    free_path = -jnp.log(jnp.maximum(1.0 - r, 1e-10)) / jnp.maximum(
        water.scatter, 1e-10)
    t_s = t0 + free_path
    collision = (t1 > t0) & (t_s < t1) & (water.scatter > 0.0)
    return collision, jnp.where(collision, t_s, t_surface)


def ocean_phase(cos_theta, water: "DeviceWater"):
    """Jerlov phase: molecular (HG g=0) + particle (HG g=0.924) mixture
    (reference ocean_utils.cuh:431-443)."""
    return (water.mol_weight * hg_phase(cos_theta, 0.0)
            + (1.0 - water.mol_weight) * hg_phase(cos_theta, WATER_PARTICLE_G))


def sample_ocean_phase_direction(w_in: Vec3, water: "DeviceWater",
                                 pixel_id, sample_id, depth,
                                 bn=None) -> Vec3:
    """Sample the molecular/particle mixture about the propagation
    direction (reference ocean_phase_sampling, ocean_utils.cuh:403-415):
    choose the component by its weight, then draw its HG cosine."""
    r_choice = random_1d(RandomTarget.VOLUME_PHASE, pixel_id, sample_id,
                         depth + 64, bn=bn)
    r2 = random_2d(RandomTarget.VOLUME_PHASE, pixel_id, sample_id,
                   depth + 128, bn=bn)
    molecular = r_choice < water.mol_weight
    g = jnp.where(molecular, 1e-3, WATER_PARTICLE_G)
    sq = (1.0 - g * g) / (1.0 - g + 2.0 * g * r2[..., 0])
    cos_t = (1.0 + g * g - sq * sq) / (2.0 * g)
    cos_t = jnp.where(molecular, 1.0 - 2.0 * r2[..., 0], cos_t)
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
