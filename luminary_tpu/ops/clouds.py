"""Procedural volumetric clouds.

Reference: src/luminary/device/cuda/cloud.cuh (3-layer raymarched clouds in
the Horizon-Zero-Dawn style), cloud_noise.cuh (GPU-generated shape/detail/
weather noise), cloud_shadow.cuh (sun-shadow marching).

TPU design: the noise is evaluated *procedurally in-register* (value-noise
FBM — zero gathers, pure VPU work at ~775 Gop/s) instead of sampled from
pre-baked 3D textures, and the march runs only for primary-ray sky misses
(once per sample); indirect bounces see the cloud-free SH sky, a deliberate
approximation until clouds are folded into the env bake.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math3


class DeviceClouds(NamedTuple):
    active: jnp.ndarray  # bool
    height_min: jnp.ndarray  # f32 (world units, low layer)
    height_max: jnp.ndarray  # f32
    coverage: jnp.ndarray  # f32
    coverage_min: jnp.ndarray  # f32
    density: jnp.ndarray  # f32
    shape_scale: jnp.ndarray  # f32
    detail_scale: jnp.ndarray  # f32
    weather_scale: jnp.ndarray  # f32
    offset: jnp.ndarray  # f32 [2]
    seed: jnp.ndarray  # f32 (noise offset)
    steps: jnp.ndarray  # i32 (static-ized at call)


def pack_clouds(cloud) -> DeviceClouds:
    import numpy as np

    layer = cloud.low
    return DeviceClouds(
        active=np.bool_(bool(cloud.active and layer.active)),
        height_min=np.float32(layer.height_min),
        height_max=np.float32(layer.height_max),
        coverage=np.float32(layer.coverage),
        coverage_min=np.float32(layer.coverage_min),
        density=np.float32(cloud.density),
        shape_scale=np.float32(cloud.noise_shape_scale),
        detail_scale=np.float32(cloud.noise_detail_scale),
        weather_scale=np.float32(cloud.noise_weather_scale),
        offset=np.asarray([cloud.offset_x, cloud.offset_z], np.float32),
        seed=np.float32(cloud.seed % 1024),
        steps=np.int32(min(max(int(cloud.steps), 8), 128)),
    )


def _hash3(p):
    """f32 hash of a 3D lattice point (no integer multiplies needed on the
    hot path beyond these — cheap sin-free construction)."""
    h = p[..., 0] * 127.1 + p[..., 1] * 311.7 + p[..., 2] * 74.7
    return jnp.abs(jnp.mod(jnp.sin(h) * 43758.5453, 1.0))


def value_noise3(p):
    """Trilinear value noise at positions [..., 3]."""
    pi = jnp.floor(p)
    pf = p - pi
    w = pf * pf * (3.0 - 2.0 * pf)

    def corner(dx, dy, dz):
        return _hash3(pi + jnp.asarray([dx, dy, dz], p.dtype))

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    x00 = c000 + (c100 - c000) * w[..., 0]
    x10 = c010 + (c110 - c010) * w[..., 0]
    x01 = c001 + (c101 - c001) * w[..., 0]
    x11 = c011 + (c111 - c011) * w[..., 0]
    y0 = x00 + (x10 - x00) * w[..., 1]
    y1 = x01 + (x11 - x01) * w[..., 1]
    return y0 + (y1 - y0) * w[..., 2]


def fbm3(p, octaves: int = 3):
    total = 0.0
    amp, norm = 0.5, 0.0
    for o in range(octaves):
        total = total + amp * value_noise3(p * (2.0**o) + 17.31 * o)
        norm += amp
        amp *= 0.5
    return total / norm


def cloud_density(cl: DeviceClouds, pos):
    """Density in [0, 1] at world positions [..., 3] (HZD-style coverage/
    height-gradient/detail-erosion recipe — our own noise stack)."""
    h = pos[..., 1]
    h01 = jnp.clip(
        (h - cl.height_min) / jnp.maximum(cl.height_max - cl.height_min, 1e-3),
        0.0, 1.0,
    )
    # height gradient: round bottoms, wispy tops
    grad = jnp.clip(h01 * 4.0, 0.0, 1.0) * jnp.clip((1.0 - h01) * 2.5, 0.0, 1.0)

    p = pos + jnp.concatenate(
        [cl.offset[0][None], cl.seed[None], cl.offset[1][None]]
    )
    weather = fbm3(
        jnp.concatenate(
            [p[..., 0:1], jnp.zeros_like(p[..., 0:1]), p[..., 2:3]], axis=-1
        )
        * (0.0004 * cl.weather_scale),
        octaves=3,
    )
    base = fbm3(p * (0.0015 * cl.shape_scale), octaves=4)
    detail = fbm3(p * (0.009 * cl.detail_scale), octaves=2)

    coverage = jnp.clip(weather * cl.coverage, cl.coverage_min, 2.0)
    d = base * grad * coverage - 0.55
    d = d - detail * 0.15  # erosion
    return jnp.clip(d * 4.0, 0.0, 1.0) * cl.density


def _layer_span(cl: DeviceClouds, origin, direction):
    oy = origin[..., 1]
    dy = direction[..., 1]
    dy_safe = jnp.where(jnp.abs(dy) < 1e-7, 1e-7, dy)
    t_lo = (cl.height_min - oy) / dy_safe
    t_hi = (cl.height_max - oy) / dy_safe
    t0 = jnp.minimum(t_lo, t_hi)
    t1 = jnp.maximum(t_lo, t_hi)
    t0 = jnp.maximum(t0, 0.0)
    return t0, jnp.maximum(t1, t0)


def cloud_march(
    cl: DeviceClouds,
    origin,
    direction,
    sun_dir,
    sun_radiance,
    sky_ambient,
    steps: int = 48,
    shadow_steps: int = 4,
):
    """March the low cloud layer. Returns (radiance [N,3], transmittance [N]).

    Lighting: sun with a short shadow march + dual-lobe HG (forward +
    backward, reference cloud.cuh scatter lerp) + ambient from the SH sky.
    """
    t0, t1 = _layer_span(cl, origin, direction)
    span = t1 - t0
    dt = span / steps
    sigma = 0.004  # extinction per density unit per meter

    cos_sun = math3.dot(direction, sun_dir)
    g1, g2, lerp = 0.65, -0.25, 0.5
    from .volume import hg_phase

    phase = hg_phase(cos_sun, g1) * lerp + hg_phase(cos_sun, g2) * (1.0 - lerp)

    shadow_len = (cl.height_max - cl.height_min) * 0.5

    import jax

    def step_fn(i, carry):
        radiance, transmittance = carry
        t = t0 + (i.astype(jnp.float32) + 0.5) * dt
        pos = origin + direction * t[..., None]
        dens = cloud_density(cl, pos) * (span > 1e-3)
        ext = dens * sigma * dt

        def shadow_fn(k, tau):
            sp = pos + sun_dir * ((k.astype(jnp.float32) + 0.5) * shadow_len / shadow_steps)
            return tau + cloud_density(cl, sp)

        shadow_tau = jax.lax.fori_loop(0, shadow_steps, shadow_fn, jnp.zeros_like(dens))
        sun_t = jnp.exp(-shadow_tau * sigma * (shadow_len / shadow_steps))
        powder = 1.0 - jnp.exp(-dens * 2.0)  # darker cores
        scatter = (
            sun_radiance * (phase * sun_t * powder)[..., None]
            + sky_ambient * 0.3
        )
        radiance = radiance + scatter * (transmittance * ext)[..., None]
        transmittance = transmittance * jnp.exp(-ext)
        return radiance, transmittance

    radiance, transmittance = jax.lax.fori_loop(
        0,
        steps,
        step_fn,
        (jnp.zeros(origin.shape[:-1] + (3,)), jnp.ones(origin.shape[:-1])),
    )
    return radiance, transmittance
