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

from .vec import Vec3, dot as vdot


class DeviceClouds(NamedTuple):
    active: jnp.ndarray  # bool
    # Per-layer arrays [3]: low / mid / top (reference: 3-layer clouds,
    # cloud.cuh). Which layers actually march is STATIC (RenderConfig
    # cloud_layers), so inactive layers cost nothing under jit.
    height_min: jnp.ndarray  # f32 [3]
    height_max: jnp.ndarray  # f32 [3]
    coverage: jnp.ndarray  # f32 [3]
    coverage_min: jnp.ndarray  # f32 [3]
    density: jnp.ndarray  # f32
    shape_scale: jnp.ndarray  # f32
    detail_scale: jnp.ndarray  # f32
    weather_scale: jnp.ndarray  # f32
    offset: jnp.ndarray  # f32 [2]
    seed: jnp.ndarray  # f32 (noise offset)
    steps: jnp.ndarray  # i32 (static-ized at call)


def pack_clouds(cloud) -> DeviceClouds:
    import numpy as np

    layers = (cloud.low, cloud.mid, cloud.top)
    return DeviceClouds(
        active=np.bool_(bool(cloud.active and any(l.active for l in layers))),
        height_min=np.asarray([l.height_min for l in layers], np.float32),
        height_max=np.asarray([l.height_max for l in layers], np.float32),
        coverage=np.asarray([l.coverage for l in layers], np.float32),
        coverage_min=np.asarray([l.coverage_min for l in layers], np.float32),
        density=np.float32(cloud.density),
        shape_scale=np.float32(cloud.noise_shape_scale),
        detail_scale=np.float32(cloud.noise_detail_scale),
        weather_scale=np.float32(cloud.noise_weather_scale),
        offset=np.asarray([cloud.offset_x, cloud.offset_z], np.float32),
        seed=np.float32(cloud.seed % 1024),
        steps=np.int32(min(max(int(cloud.steps), 8), 128)),
    )


def active_layer_indices(cloud) -> tuple:
    """Static tuple of active layer indices for RenderConfig."""
    return tuple(
        i for i, l in enumerate((cloud.low, cloud.mid, cloud.top)) if l.active
    ) if cloud.active else ()


def _hash3(px, py, pz):
    """f32 hash of a 3D lattice point (sin-free is not worth it here; one
    transcendental per corner on the VPU)."""
    h = px * 127.1 + py * 311.7 + pz * 74.7
    return jnp.abs(jnp.mod(jnp.sin(h) * 43758.5453, 1.0))


def value_noise3(p: Vec3):
    """Trilinear value noise at component-SoA positions."""
    ix, iy, iz = jnp.floor(p.x), jnp.floor(p.y), jnp.floor(p.z)
    fx, fy, fz = p.x - ix, p.y - iy, p.z - iz
    wx = fx * fx * (3.0 - 2.0 * fx)
    wy = fy * fy * (3.0 - 2.0 * fy)
    wz = fz * fz * (3.0 - 2.0 * fz)

    c000 = _hash3(ix, iy, iz)
    c100 = _hash3(ix + 1, iy, iz)
    c010 = _hash3(ix, iy + 1, iz)
    c110 = _hash3(ix + 1, iy + 1, iz)
    c001 = _hash3(ix, iy, iz + 1)
    c101 = _hash3(ix + 1, iy, iz + 1)
    c011 = _hash3(ix, iy + 1, iz + 1)
    c111 = _hash3(ix + 1, iy + 1, iz + 1)
    x00 = c000 + (c100 - c000) * wx
    x10 = c010 + (c110 - c010) * wx
    x01 = c001 + (c101 - c001) * wx
    x11 = c011 + (c111 - c011) * wx
    y0 = x00 + (x10 - x00) * wy
    y1 = x01 + (x11 - x01) * wy
    return y0 + (y1 - y0) * wz


def fbm3(p: Vec3, octaves: int = 3):
    total = 0.0
    amp, norm = 0.5, 0.0
    for o in range(octaves):
        q = Vec3(
            p.x * (2.0**o) + 17.31 * o,
            p.y * (2.0**o) + 17.31 * o,
            p.z * (2.0**o) + 17.31 * o,
        )
        total = total + amp * value_noise3(q)
        norm += amp
        amp *= 0.5
    return total / norm


def cloud_density(cl: DeviceClouds, pos: Vec3, layer: int = 0):
    """Density in [0, 1] at component-SoA world positions (HZD-style
    coverage/height-gradient/detail-erosion recipe — our own noise stack).
    `layer` is static (0=low, 1=mid, 2=top)."""
    h = pos.y
    lo = cl.height_min[layer]
    hi = cl.height_max[layer]
    h01 = jnp.clip((h - lo) / jnp.maximum(hi - lo, 1e-3), 0.0, 1.0)
    # height gradient: round bottoms, wispy tops
    grad = jnp.clip(h01 * 4.0, 0.0, 1.0) * jnp.clip((1.0 - h01) * 2.5, 0.0, 1.0)

    p = Vec3(pos.x + cl.offset[0], pos.y + cl.seed, pos.z + cl.offset[1])
    ws = 0.0004 * cl.weather_scale
    weather = fbm3(Vec3(p.x * ws, jnp.zeros_like(p.y), p.z * ws), octaves=3)
    ss = 0.0015 * cl.shape_scale
    base = fbm3(Vec3(p.x * ss, p.y * ss, p.z * ss), octaves=4)
    ds = 0.009 * cl.detail_scale
    detail = fbm3(Vec3(p.x * ds, p.y * ds, p.z * ds), octaves=2)

    coverage = jnp.clip(weather * cl.coverage[layer], cl.coverage_min[layer], 2.0)
    d = base * grad * coverage - 0.55
    d = d - detail * 0.15  # erosion
    return jnp.clip(d * 4.0, 0.0, 1.0) * cl.density


def _layer_span(cl: DeviceClouds, origin: Vec3, direction: Vec3, layer: int):
    oy = origin.y
    dy = direction.y
    dy_safe = jnp.where(jnp.abs(dy) < 1e-7, 1e-7, dy)
    t_lo = (cl.height_min[layer] - oy) / dy_safe
    t_hi = (cl.height_max[layer] - oy) / dy_safe
    t0 = jnp.minimum(t_lo, t_hi)
    t1 = jnp.maximum(t_lo, t_hi)
    t0 = jnp.maximum(t0, 0.0)
    return t0, jnp.maximum(t1, t0)


def cloud_march(
    cl: DeviceClouds,
    origin: Vec3,
    direction: Vec3,
    sun_dir: Vec3,
    sun_radiance,  # f32 [3]
    sky_ambient,  # (r, g, b) channel arrays
    steps: int = 48,
    shadow_steps: int = 4,
    layers: tuple = (0,),
):
    """March the active cloud layers → ((r,g,b) radiance, transmittance [N]).

    `layers` is a STATIC tuple of layer indices; layers are composited in
    index order (low → mid → top), which matches the along-ray order for
    ground-based upward rays — the reference's 3-layer march (cloud.cuh).
    Lighting per layer: sun with a short shadow march + dual-lobe HG
    (forward + backward, reference cloud.cuh scatter lerp) + sky ambient.
    """
    rr_tot = jnp.zeros_like(origin.x)
    rg_tot = jnp.zeros_like(origin.x)
    rb_tot = jnp.zeros_like(origin.x)
    trans_tot = jnp.ones_like(origin.x)
    for layer in layers:
        lsteps = max(steps // (1 + (layer == 2)), 8)  # cirrus: thin, cheaper
        (lr, lg, lb), lt = _march_one_layer(
            cl, origin, direction, sun_dir, sun_radiance, sky_ambient,
            lsteps, shadow_steps, layer,
        )
        rr_tot = rr_tot + trans_tot * lr
        rg_tot = rg_tot + trans_tot * lg
        rb_tot = rb_tot + trans_tot * lb
        trans_tot = trans_tot * lt
    return (rr_tot, rg_tot, rb_tot), trans_tot


def _march_one_layer(
    cl: DeviceClouds,
    origin: Vec3,
    direction: Vec3,
    sun_dir: Vec3,
    sun_radiance,
    sky_ambient,
    steps: int,
    shadow_steps: int,
    layer: int,
):
    t0, t1 = _layer_span(cl, origin, direction, layer)
    span = t1 - t0
    dt = span / steps
    sigma = 0.004  # extinction per density unit per meter

    cos_sun = vdot(direction, sun_dir)
    g1, g2, lerp = 0.65, -0.25, 0.5
    from .volume import hg_phase

    phase = hg_phase(cos_sun, g1) * lerp + hg_phase(cos_sun, g2) * (1.0 - lerp)

    shadow_len = (cl.height_max[layer] - cl.height_min[layer]) * 0.5

    import jax

    amb_r, amb_g, amb_b = sky_ambient
    n_shape = origin.x.shape

    def step_fn(i, carry):
        rr, rg, rb, transmittance = carry
        t = t0 + (i.astype(jnp.float32) + 0.5) * dt
        pos = Vec3(
            origin.x + direction.x * t,
            origin.y + direction.y * t,
            origin.z + direction.z * t,
        )
        dens = cloud_density(cl, pos, layer) * (span > 1e-3)
        ext = dens * sigma * dt

        def shadow_fn(k, tau):
            o = (k.astype(jnp.float32) + 0.5) * shadow_len / shadow_steps
            sp = Vec3(pos.x + sun_dir.x * o, pos.y + sun_dir.y * o, pos.z + sun_dir.z * o)
            return tau + cloud_density(cl, sp, layer)

        shadow_tau = jax.lax.fori_loop(0, shadow_steps, shadow_fn, jnp.zeros_like(dens))
        sun_t = jnp.exp(-shadow_tau * sigma * (shadow_len / shadow_steps))
        powder = 1.0 - jnp.exp(-dens * 2.0)  # darker cores
        lit = phase * sun_t * powder
        w = transmittance * ext
        rr = rr + (sun_radiance[0] * lit + amb_r * 0.3) * w
        rg = rg + (sun_radiance[1] * lit + amb_g * 0.3) * w
        rb = rb + (sun_radiance[2] * lit + amb_b * 0.3) * w
        transmittance = transmittance * jnp.exp(-ext)
        return rr, rg, rb, transmittance

    rr, rg, rb, transmittance = jax.lax.fori_loop(
        0, steps, step_fn,
        (jnp.zeros(n_shape), jnp.zeros(n_shape), jnp.zeros(n_shape), jnp.ones(n_shape)),
    )
    return (rr, rg, rb), transmittance


def cloud_sun_transmittance(
    cl: DeviceClouds,
    pos: Vec3,
    sun_dir: Vec3,
    layers: tuple = (0,),
    steps: int = 3,
):
    """Sun transmittance through the cloud layers from a SURFACE point —
    cloud shadows on the ground (reference: cloud_shadow.cuh sun marching).
    Coarse fixed-step density march per active layer; [N] factor in [0,1].
    """
    import jax

    sigma = 0.004
    trans = jnp.ones_like(pos.x)
    for layer in layers:
        t0, t1 = _layer_span(cl, pos, sun_dir, layer)
        span = jnp.maximum(t1 - t0, 0.0)
        dt = span / steps

        def step_fn(i, tau, _t0=t0, _dt=dt, _layer=layer):
            t = _t0 + (i.astype(jnp.float32) + 0.5) * _dt
            sp = Vec3(
                pos.x + sun_dir.x * t,
                pos.y + sun_dir.y * t,
                pos.z + sun_dir.z * t,
            )
            return tau + cloud_density(cl, sp, _layer)

        tau = jax.lax.fori_loop(0, steps, step_fn, jnp.zeros_like(pos.x))
        trans = trans * jnp.exp(-tau * sigma * dt)
    return trans
