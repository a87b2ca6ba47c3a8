"""Physical sky: spherical single-scattering atmosphere with multiscatter
approximation, transmittance LUT, and environment-map baking.

The reference implements Hillaire-2020 with Bruneton-style transmittance +
multiscattering LUTs and an 8-wavelength spectral extension (reference:
src/luminary/device/cuda/sky.cuh:11-24, device_sky.c — 256x64 transmittance,
32² multiscattering, sky_defines.h:12-14). The TPU build keeps the same LUT
pipeline in RGB: LUTs are jit-precomputed on device, and DEFAULT-mode sky is
*baked to a lat-long environment map* whenever sky parameters change (the
reference's HDRI-bake path, generalized to the default path as well) — at
shading time a sky miss is two texture gathers instead of a 40-step raymarch
per lane, which is the right trade on TPU where the bake is one big dense op.

Units: kilometres (matching the reference's sky parameter conventions:
rayleigh_falloff 8 km etc., sky_defines.h:4-10).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import math3

EARTH_RADIUS = 6371.0  # km
ATMO_HEIGHT = 100.0
ATMO_RADIUS = EARTH_RADIUS + ATMO_HEIGHT

# Sea-level coefficients, km^-1 (standard clear-sky values)
BETA_RAYLEIGH = np.asarray([5.802e-3, 13.558e-3, 33.1e-3])
BETA_MIE_SCATTER = 3.996e-3
BETA_MIE_ABSORB = 4.4e-4
BETA_OZONE_ABS = np.asarray([0.650e-3, 1.881e-3, 0.085e-3])

TRANSMITTANCE_W, TRANSMITTANCE_H = 256, 64  # reference sky_defines.h:13-14
MULTISCATTER_RES = 32  # reference sky_defines.h:12


class AtmoParams(NamedTuple):
    """Runtime atmosphere parameters (from the Sky entity).

    beta_* carry the scattering/absorption spectra: [3] RGB by default, or
    [8] SKY_BANDS wavelengths in spectral mode (reference: sky.cuh:11-24
    8-wavelength atmosphere) — every LUT/bake below is channel-generic.
    """

    beta_r: jnp.ndarray     # rayleigh scatter  [C] km^-1
    beta_ms: jnp.ndarray    # mie scatter (gray) scalar
    beta_ma: jnp.ndarray    # mie absorb (gray) scalar
    beta_o: jnp.ndarray     # ozone absorb [C]
    base_density: jnp.ndarray
    rayleigh_density: jnp.ndarray
    mie_density: jnp.ndarray
    ozone_density: jnp.ndarray
    rayleigh_falloff: jnp.ndarray  # scale height km
    mie_falloff: jnp.ndarray
    ozone_layer_thickness: jnp.ndarray
    ozone_absorption: jnp.ndarray  # 0/1
    multiscattering_factor: jnp.ndarray
    ground_visibility: jnp.ndarray
    mie_g: jnp.ndarray


def atmo_params_from_sky(sky, spectral: bool = False) -> AtmoParams:
    # Droplet diameter → HG anisotropy (reference maps mie_diameter onto the
    # phase; bigger droplets → stronger forward scattering)
    g = jnp.clip(0.5 + 0.2 * jnp.log10(jnp.maximum(sky.mie_diameter, 0.1)), 0.2, 0.95)
    if spectral:
        from .spectral import ozone_beta_bands, rayleigh_beta_bands

        beta_r = jnp.asarray(rayleigh_beta_bands())
        beta_o = jnp.asarray(ozone_beta_bands())
    else:
        beta_r = jnp.asarray(BETA_RAYLEIGH, jnp.float32)
        beta_o = jnp.asarray(BETA_OZONE_ABS, jnp.float32)
    return AtmoParams(
        beta_r=beta_r,
        beta_ms=jnp.float32(BETA_MIE_SCATTER),
        beta_ma=jnp.float32(BETA_MIE_ABSORB),
        beta_o=beta_o,
        base_density=jnp.float32(sky.base_density),
        rayleigh_density=jnp.float32(sky.rayleigh_density),
        mie_density=jnp.float32(sky.mie_density),
        ozone_density=jnp.float32(sky.ozone_density),
        rayleigh_falloff=jnp.float32(sky.rayleigh_falloff),
        mie_falloff=jnp.float32(sky.mie_falloff),
        ozone_layer_thickness=jnp.float32(sky.ozone_layer_thickness),
        ozone_absorption=jnp.float32(1.0 if sky.ozone_absorption else 0.0),
        multiscattering_factor=jnp.float32(sky.multiscattering_factor),
        ground_visibility=jnp.float32(sky.ground_visibility),
        mie_g=g,
    )


def _densities(p: AtmoParams, h):
    """(rayleigh, mie, ozone) relative densities at height h (km)."""
    h = jnp.maximum(h, 0.0)
    d_r = p.base_density * p.rayleigh_density * jnp.exp(-h / p.rayleigh_falloff)
    d_m = p.base_density * p.mie_density * jnp.exp(-h / p.mie_falloff)
    # Tent-shaped ozone layer centred at 25 km (standard profile).
    d_o = (
        p.base_density
        * p.ozone_density
        * p.ozone_absorption
        * jnp.maximum(1.0 - jnp.abs(h - 25.0) / jnp.maximum(p.ozone_layer_thickness, 1e-3), 0.0)
    )
    return d_r, d_m, d_o


def _ray_sphere_exit(o, d, radius):
    """Distance to exit a sphere centred at origin (o inside)."""
    b = math3.dot(o, d)
    c = math3.dot(o, o) - radius * radius
    disc = jnp.maximum(b * b - c, 0.0)
    return -b + jnp.sqrt(disc)


def _ray_sphere_entry(o, d, radius):
    """Distance to a sphere (inf when missing); o outside or inside."""
    b = math3.dot(o, d)
    c = math3.dot(o, o) - radius * radius
    disc = b * b - c
    hit = disc >= 0.0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where(hit & (t > 0.0), t, jnp.inf)


def optical_depth(p: AtmoParams, origin, direction, dist, steps: int = 32):
    """∫ extinction along [0, dist]. origin is planet-centred (km). [..., 3]."""
    dt = dist / steps
    ts = (jnp.arange(steps) + 0.5) / steps

    def step_fn(carry, frac):
        pos = origin + direction * (frac * dist)[..., None]
        h = math3.length(pos) - EARTH_RADIUS
        d_r, d_m, d_o = _densities(p, h)
        ext = (
            p.beta_r * d_r[..., None]
            + (p.beta_ms + p.beta_ma) * d_m[..., None]
            + p.beta_o * d_o[..., None]
        )
        return carry + ext * dt[..., None], None

    c = p.beta_r.shape[0]
    tau, _ = jax.lax.scan(step_fn, jnp.zeros(origin.shape[:-1] + (c,)), ts)
    return tau


def transmittance_to_space(p: AtmoParams, height, cos_zenith, steps: int = 40):
    """T(h, μ) through the whole atmosphere. Batched over inputs."""
    o = jnp.stack(
        [jnp.zeros_like(height), height + EARTH_RADIUS, jnp.zeros_like(height)],
        axis=-1,
    )
    sin_z = jnp.sqrt(jnp.maximum(1.0 - cos_zenith**2, 0.0))
    d = jnp.stack([sin_z, cos_zenith, jnp.zeros_like(height)], axis=-1)
    dist = _ray_sphere_exit(o, d, ATMO_RADIUS)
    return jnp.exp(-optical_depth(p, o, d, dist, steps))


def build_transmittance_lut(p: AtmoParams) -> jax.Array:
    """[H, W, 3] LUT over (height, cos_zenith) — reference 256x64 layout."""
    hs = jnp.linspace(0.0, ATMO_HEIGHT, TRANSMITTANCE_H)
    mus = jnp.linspace(-0.3, 1.0, TRANSMITTANCE_W)
    hh, mm = jnp.meshgrid(hs, mus, indexing="ij")
    return transmittance_to_space(p, hh.reshape(-1), mm.reshape(-1)).reshape(
        TRANSMITTANCE_H, TRANSMITTANCE_W, int(p.beta_r.shape[0])
    )


def sample_transmittance_lut(lut, height, cos_zenith):
    """Bilinear fetch from the (height, μ) LUT."""
    hi = jnp.clip(height / ATMO_HEIGHT, 0.0, 1.0) * (TRANSMITTANCE_H - 1)
    mi = jnp.clip((cos_zenith + 0.3) / 1.3, 0.0, 1.0) * (TRANSMITTANCE_W - 1)
    h0 = jnp.clip(hi.astype(jnp.int32), 0, TRANSMITTANCE_H - 2)
    m0 = jnp.clip(mi.astype(jnp.int32), 0, TRANSMITTANCE_W - 2)
    fh = (hi - h0)[..., None]
    fm = (mi - m0)[..., None]
    return (
        lut[h0, m0] * (1 - fh) * (1 - fm)
        + lut[h0 + 1, m0] * fh * (1 - fm)
        + lut[h0, m0 + 1] * (1 - fh) * fm
        + lut[h0 + 1, m0 + 1] * fh * fm
    )


def _rayleigh_phase(c):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + c * c)


def _hg_phase(c, g):
    g2 = g * g
    return (1.0 - g2) / (4.0 * jnp.pi * jnp.power(1.0 + g2 - 2.0 * g * c, 1.5))


def single_scatter(
    p: AtmoParams,
    t_lut,
    origin,  # planet-centred km [..., 3]
    direction,
    sun_dir,
    sun_irradiance,
    steps: int = 40,
    multiscatter_lut=None,
):
    """In-scattered radiance along a view ray to the atmosphere boundary (or
    the ground). Returns (radiance [..., 3], view_transmittance [..., 3])."""
    dist_space = _ray_sphere_exit(origin, direction, ATMO_RADIUS)
    dist_ground = _ray_sphere_entry(origin, direction, EARTH_RADIUS)
    hits_ground = jnp.isfinite(dist_ground)
    dist = jnp.where(hits_ground, dist_ground, dist_space)

    cos_theta = math3.dot(direction, sun_dir)
    ph_r = _rayleigh_phase(cos_theta)[..., None]
    ph_m = _hg_phase(cos_theta, p.mie_g)[..., None]

    dt = dist / steps
    fracs = (jnp.arange(steps) + 0.5) / steps

    def step_fn(carry, frac):
        tau_acc, radiance = carry
        pos = origin + direction * (frac * dist)[..., None]
        r = math3.length(pos)
        h = r - EARTH_RADIUS
        d_r, d_m, d_o = _densities(p, h)
        ext = (
            p.beta_r * d_r[..., None]
            + (p.beta_ms + p.beta_ma) * d_m[..., None]
            + p.beta_o * d_o[..., None]
        )
        seg_tau = ext * dt[..., None]
        t_view = jnp.exp(-(tau_acc + 0.5 * seg_tau))

        cos_sun_zen = math3.dot(pos, sun_dir) / jnp.maximum(r, 1e-6)
        t_sun = sample_transmittance_lut(t_lut, h, cos_sun_zen)
        # Earth shadow: sun below the local horizon through the planet.
        horizon_mu = -jnp.sqrt(
            jnp.maximum(1.0 - (EARTH_RADIUS / jnp.maximum(r, EARTH_RADIUS)) ** 2, 0.0)
        )
        lit = (cos_sun_zen > horizon_mu).astype(jnp.float32)[..., None]

        scat_r = p.beta_r * d_r[..., None]
        scat_m = p.beta_ms * d_m[..., None]
        inscatter = (scat_r * ph_r + scat_m * ph_m) * t_sun * lit
        if multiscatter_lut is not None:
            ms = sample_multiscatter_lut(multiscatter_lut, h, cos_sun_zen)
            inscatter = inscatter + (scat_r + scat_m) * ms * p.multiscattering_factor
        radiance = radiance + inscatter * t_view * dt[..., None] * sun_irradiance
        return (tau_acc + seg_tau, radiance), None

    c = p.beta_r.shape[0]
    init = (
        jnp.zeros(origin.shape[:-1] + (c,)),
        jnp.zeros(origin.shape[:-1] + (c,)),
    )
    (tau, radiance), _ = jax.lax.scan(step_fn, init, fracs)
    t_view_total = jnp.exp(-tau)

    # Ground contribution: diffuse earth lit by the sun.
    ground_pos = origin + direction * dist[..., None]
    g_up = math3.normalize(ground_pos)
    g_cos = jnp.maximum(math3.dot(g_up, sun_dir), 0.0)
    g_t_sun = sample_transmittance_lut(t_lut, jnp.zeros_like(dist), math3.dot(g_up, sun_dir))
    ground_albedo = 0.25
    ground = (
        hits_ground[..., None]
        * (ground_albedo / jnp.pi)
        * g_cos[..., None]
        * g_t_sun
        * t_view_total
        * sun_irradiance
    )
    return radiance + ground, t_view_total


def build_multiscatter_lut(p: AtmoParams, t_lut) -> jax.Array:
    """Hillaire Ψ_ms: isotropic multiple-scattering transfer on a 32² grid
    over (height, sun cos zenith). Second-order with the infinite-bounce
    geometric-series closure."""
    res = MULTISCATTER_RES
    hs = jnp.linspace(0.0, ATMO_HEIGHT, res)
    mus = jnp.linspace(-1.0, 1.0, res)
    hh, mm = jnp.meshgrid(hs, mus, indexing="ij")
    h_flat = hh.reshape(-1)
    mu_flat = mm.reshape(-1)

    # 8x8 direction sphere sampling
    nd = 8
    i = (jnp.arange(nd) + 0.5) / nd
    phi = 2.0 * jnp.pi * i
    cos_t = 1.0 - 2.0 * i
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t**2, 0.0))
    dirs = jnp.stack(
        [
            sin_t[:, None] * jnp.cos(phi)[None, :],
            jnp.broadcast_to(cos_t[:, None], (nd, nd)),
            sin_t[:, None] * jnp.sin(phi)[None, :],
        ],
        axis=-1,
    ).reshape(-1, 3)

    def entry(h, mu_s):
        o = jnp.asarray([0.0, 1.0, 0.0]) * (EARTH_RADIUS + h)
        sun = jnp.stack(
            [jnp.sqrt(jnp.maximum(1.0 - mu_s**2, 0.0)), mu_s, jnp.asarray(0.0)]
        )
        o_b = jnp.broadcast_to(o, dirs.shape)
        sun_b = jnp.broadcast_to(sun, dirs.shape)
        # L_2nd: uniform-sphere average of single scatter (isotropic proxy)
        rad, _ = single_scatter(
            p, t_lut, o_b, dirs, sun_b, 1.0, steps=16, multiscatter_lut=None
        )
        l2 = jnp.mean(rad, axis=0)
        # f_ms: scattering albedo of a uniform bounce (transfer factor)
        d_r, d_m, _ = _densities(p, h)
        # geometric series closure 1/(1-f); approximate f with path albedo
        f = jnp.clip(
            (jnp.mean(p.beta_r) * d_r + p.beta_ms * d_m)
            / jnp.maximum(
                jnp.mean(p.beta_r) * d_r
                + (p.beta_ms + p.beta_ma) * d_m
                + 1e-9,
                1e-9,
            )
            * 0.7,
            0.0,
            0.95,
        )
        return l2 / (1.0 - f)

    vals = jax.vmap(entry)(h_flat, mu_flat)
    return vals.reshape(res, res, int(p.beta_r.shape[0]))


def sample_multiscatter_lut(lut, height, cos_sun_zenith):
    hi = jnp.clip(height / ATMO_HEIGHT, 0.0, 1.0) * (MULTISCATTER_RES - 1)
    mi = jnp.clip((cos_sun_zenith + 1.0) / 2.0, 0.0, 1.0) * (MULTISCATTER_RES - 1)
    h0 = jnp.clip(hi.astype(jnp.int32), 0, MULTISCATTER_RES - 2)
    m0 = jnp.clip(mi.astype(jnp.int32), 0, MULTISCATTER_RES - 2)
    fh = (hi - h0)[..., None]
    fm = (mi - m0)[..., None]
    return (
        lut[h0, m0] * (1 - fh) * (1 - fm)
        + lut[h0 + 1, m0] * fh * (1 - fm)
        + lut[h0, m0 + 1] * (1 - fh) * fm
        + lut[h0 + 1, m0 + 1] * fh * fm
    )


@partial(jax.jit, static_argnames=("width", "height", "steps"))
def bake_sky_envmap(
    p: AtmoParams,
    t_lut,
    ms_lut,
    observer_height,
    sun_dir,
    sun_irradiance,
    width: int = 512,
    height: int = 256,
    steps: int = 40,
):
    """Lat-long environment map of the sky (no solar disc — that stays
    analytic for sharpness). The reference's SKY_COMPUTE_HDRI equivalent."""
    v = (jnp.arange(height) + 0.5) / height
    u = (jnp.arange(width) + 0.5) / width
    theta = v * jnp.pi  # 0 = up
    phi = u * 2.0 * jnp.pi
    st = jnp.sin(theta)[:, None]
    dirs = jnp.stack(
        [
            jnp.broadcast_to(st * jnp.cos(phi)[None, :], (height, width)),
            jnp.broadcast_to(jnp.cos(theta)[:, None], (height, width)),
            jnp.broadcast_to(st * jnp.sin(phi)[None, :], (height, width)),
        ],
        axis=-1,
    ).reshape(-1, 3)
    o = jnp.asarray([0.0, 1.0, 0.0]) * (EARTH_RADIUS + observer_height)
    o_b = jnp.broadcast_to(o, dirs.shape)
    sun_b = jnp.broadcast_to(sun_dir, dirs.shape)
    rad, _ = single_scatter(
        p, t_lut, o_b, dirs, sun_b, sun_irradiance, steps=steps,
        multiscatter_lut=ms_lut,
    )
    return rad.reshape(height, width, int(p.beta_r.shape[0]))


AERIAL_NU = 16   # view zenith bins
AERIAL_NS = 8    # sun-relative azimuth bins
AERIAL_ND = 16   # log distance knots
AERIAL_D_MIN = 0.02   # km
AERIAL_D_MAX = 64.0   # km (beyond: clamp to the last knot)


@partial(jax.jit, static_argnames=())
def bake_aerial_rows(p: AtmoParams, t_lut, ms_lut, observer_height,
                     sun_dir, sun_irradiance):
    """Aerial-perspective table (reference: the per-depth SKY_INSCATTERING
    pass over surface-hit segments, device_renderer.c:59-131 + sky.cuh).

    One row per (view zenith, sun-relative azimuth) carries the WHOLE
    distance curve: cols 0:48 inscattered RGB at 16 log-spaced distances,
    cols 48:96 transmittance RGB at the same knots — so a hit segment costs
    ONE row gather + an in-register distance lerp. Rows [NU*NS, 128].
    """
    mus = (jnp.arange(AERIAL_NU) + 0.5) / AERIAL_NU * 2.0 - 1.0
    azs = (jnp.arange(AERIAL_NS) + 0.5) / AERIAL_NS * 2.0 * jnp.pi
    # sun frame: build view dirs with the given zenith cos and azimuth
    # measured from the sun's azimuth plane
    sx, sy, sz = sun_dir[0], sun_dir[1], sun_dir[2]
    s_h = jnp.sqrt(jnp.maximum(sx * sx + sz * sz, 1e-12))
    fx, fz = sx / s_h, sz / s_h  # horizontal sun azimuth
    mu_g, az_g = jnp.meshgrid(mus, azs, indexing="ij")
    mu_f = mu_g.reshape(-1)
    az_f = az_g.reshape(-1)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - mu_f**2, 0.0))
    # horizontal component rotated by az from the sun azimuth
    hx = jnp.cos(az_f) * fx - jnp.sin(az_f) * fz
    hz = jnp.cos(az_f) * fz + jnp.sin(az_f) * fx
    dirs = jnp.stack([sin_t * hx, mu_f, sin_t * hz], axis=-1)  # [R, 3]

    r = dirs.shape[0]
    o = jnp.asarray([0.0, 1.0, 0.0]) * (EARTH_RADIUS + observer_height)
    o_b = jnp.broadcast_to(o, (r, 3))
    sun_b = jnp.broadcast_to(jnp.stack([sx, sy, sz]), (r, 3))

    dists = jnp.exp(jnp.linspace(
        jnp.log(AERIAL_D_MIN), jnp.log(AERIAL_D_MAX), AERIAL_ND))
    cos_theta = math3.dot(dirs, sun_b)
    ph_r = _rayleigh_phase(cos_theta)[..., None]
    ph_m = _hg_phase(cos_theta, p.mie_g)[..., None]

    sub = 4  # march substeps per distance knot
    tau = jnp.zeros((r, 3))
    rad = jnp.zeros((r, 3))
    rows = jnp.zeros((r, 128))
    d_prev = 0.0
    for k in range(AERIAL_ND):
        d_k = dists[k]
        seg = (d_k - d_prev) / sub
        for s_i in range(sub):
            t_mid = d_prev + (s_i + 0.5) * seg
            pos = o_b + dirs * t_mid
            rr = math3.length(pos)
            h = rr - EARTH_RADIUS
            d_r, d_m, d_o = _densities(p, h)
            ext = (p.beta_r * d_r[..., None]
                   + (p.beta_ms + p.beta_ma) * d_m[..., None]
                   + p.beta_o * d_o[..., None])
            t_view = jnp.exp(-(tau + 0.5 * ext * seg))
            cos_sun_zen = math3.dot(pos, sun_b) / jnp.maximum(rr, 1e-6)
            t_sun = sample_transmittance_lut(t_lut, h, cos_sun_zen)
            horizon_mu = -jnp.sqrt(jnp.maximum(
                1.0 - (EARTH_RADIUS / jnp.maximum(rr, EARTH_RADIUS)) ** 2,
                0.0))
            lit = (cos_sun_zen > horizon_mu).astype(jnp.float32)[..., None]
            scat_r = p.beta_r * d_r[..., None]
            scat_m = p.beta_ms * d_m[..., None]
            inscatter = (scat_r * ph_r + scat_m * ph_m) * t_sun * lit
            ms = sample_multiscatter_lut(ms_lut, h, cos_sun_zen)
            inscatter = inscatter + (scat_r + scat_m) * ms * \
                p.multiscattering_factor
            rad = rad + inscatter * t_view * seg * sun_irradiance
            tau = tau + ext * seg
        rows = rows.at[:, 3 * k:3 * k + 3].set(rad)
        rows = rows.at[:, 48 + 3 * k:48 + 3 * k + 3].set(jnp.exp(-tau))
        d_prev = d_k
    return rows


def sample_envmap(env, direction):
    """Bilinear lat-long sample for a direction wavefront [N,3] → [N,3]."""
    h, w = env.shape[0], env.shape[1]
    theta = jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(direction[..., 2], direction[..., 0]) % (2.0 * jnp.pi)
    fy = jnp.clip(theta / jnp.pi * h - 0.5, 0.0, h - 1.001)
    fx = phi / (2.0 * jnp.pi) * w - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32) % w
    x1 = (x0 + 1) % w
    y0 = jnp.clip(fy.astype(jnp.int32), 0, h - 2)
    wy = (fy - y0)[..., None]
    wx = (fx - jnp.floor(fx))[..., None]
    return (
        env[y0, x0] * (1 - wy) * (1 - wx)
        + env[y0, x1] * (1 - wy) * wx
        + env[y0 + 1, x0] * wy * (1 - wx)
        + env[y0 + 1, x1] * wy * wx
    )
