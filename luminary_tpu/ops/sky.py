"""Sky radiance evaluation.

The DEFAULT-mode sky is a physical atmosphere (ops/atmosphere.py: Bruneton
transmittance LUT + Hillaire-style multiscatter, reference: cuda/sky.cuh,
device_sky.c) *baked into a lat-long environment map* at sky-update time; a
sky miss costs a bilinear env fetch instead of a 40-step raymarch per lane.
The solar disc stays analytic (limb-darkened, transmittance-tinted) so it is
pixel-sharp at any env resolution. CONSTANT_COLOR mode matches the reference
enum; HDRI mode reuses the same env-map machinery with user-provided maps.

Calibration: with exposure 1.0 a sun-lit 0.5-albedo surface lands near
mid-gray (SUN_IRRADIANCE = 1.25 at the top of the atmosphere); the physically
correct sun:sky ratio then follows from the scattering integrals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vec import Vec3, dot as vdot, normalize

# Moon angular radius seen from earth (reference sky_defines.h: moon radius
# 1737.4 km at 384400 km).
MOON_ANGULAR_RADIUS = 0.00452
MOON_COS_RADIUS = 0.999989786
MOON_ALBEDO = 0.12

STARS_GRID = 64  # reference: STARS_GRID_LD (device_utils.h:41)

# Sun angular radius as seen from earth (~0.2667 deg).
SUN_COS_RADIUS = 0.99998869
SUN_ANGULAR_RADIUS = 0.004675  # radians
_SUN_SOLID_ANGLE = 6.87e-5  # 2π(1-cos θ_sun)

SUN_IRRADIANCE = 1.25  # top-of-atmosphere, at exposure-1 calibration
SUN_RADIANCE = SUN_IRRADIANCE / _SUN_SOLID_ANGLE


def sun_dir_vec(sky) -> Vec3:
    return Vec3(sky.sun_dir[0], sky.sun_dir[1], sky.sun_dir[2])


def sample_env_rows(sky, d: Vec3):
    """Bilinear lat-long fetch from the quad-row env layout (see
    env_to_rows): ONE row gather carries the whole 2x2 footprint — gathers
    cost per-index on TPU, row width is nearly free.
    Returns (r, g, b) channel arrays."""
    h = sky.env_h.astype(jnp.float32)
    w = sky.env_w.astype(jnp.float32)
    wi = sky.env_w
    theta = jnp.arccos(jnp.clip(d.y, -1.0, 1.0))
    phi = jnp.arctan2(d.z, d.x) % (2.0 * jnp.pi)
    fy = jnp.clip(theta * (1.0 / jnp.pi) * h - 0.5, 0.0, h - 1.001)
    fx = phi * (0.5 / jnp.pi) * w - 0.5
    x0f = jnp.floor(fx)
    x0 = x0f.astype(jnp.int32) % wi
    y0 = jnp.clip(fy.astype(jnp.int32), 0, sky.env_h - 2)
    wy = fy - y0.astype(jnp.float32)
    wx = fx - x0f
    from .rowops import gather_planar

    r0 = gather_planar(sky.env_rows, y0 * wi + x0)  # planar [16, N]
    one_wx = 1.0 - wx
    one_wy = 1.0 - wy

    def lerp(c):
        top = r0[c] * one_wx + r0[c + 4] * wx
        bot = r0[c + 8] * one_wx + r0[c + 12] * wx
        return top * one_wy + bot * wy

    return lerp(0), lerp(1), lerp(2)


def sky_radiance(sky, direction: Vec3, include_sun=True) -> Vec3:
    """Environment radiance for escaping rays → RGB Vec3 of [N] channels.

    include_sun: whether the solar disc contributes (the integrator handles
    disc MIS itself and passes False, adding the disc explicitly).
    """
    d = direction
    # Bilinear fetch of the baked environment (reference: sky_hdri.cuh
    # sampling; DEFAULT mode's per-miss LUT raymarch becomes a pack-time
    # bake + cheap fetch on TPU).
    r, g, b = sample_env_rows(sky, d)

    cos_sun = vdot(d, sun_dir_vec(sky))
    in_disc = cos_sun >= SUN_COS_RADIUS
    center = jnp.clip((cos_sun - SUN_COS_RADIUS) / (1.0 - SUN_COS_RADIUS), 0.0, 1.0)
    limb = jnp.where(in_disc, 0.3 + 0.7 * jnp.sqrt(center), 0.0)
    include = jnp.asarray(include_sun)
    disc = limb * include
    r = r + disc * sky.sun_disc_radiance[0]
    g = g + disc * sky.sun_disc_radiance[1]
    b = b + disc * sky.sun_disc_radiance[2]

    # moon + stars (DEFAULT mode only; occluded regions handled by the moon
    # disc overriding stars)
    moon, in_moon = moon_radiance(sky, d)
    sr, sg, sb = stars_radiance(sky, d)
    sr = jnp.where(in_moon | in_disc, 0.0, sr)
    sg = jnp.where(in_moon | in_disc, 0.0, sg)
    sb = jnp.where(in_moon | in_disc, 0.0, sb)
    is_default = sky.mode == 0
    r = r + (moon + sr) * is_default
    g = g + (moon + sg) * is_default
    b = b + (moon + sb) * is_default

    is_const = sky.mode == 2
    return Vec3(
        jnp.where(is_const, sky.constant_color[0], r),
        jnp.where(is_const, sky.constant_color[1], g),
        jnp.where(is_const, sky.constant_color[2], b),
    )


def _hash_u32(x):
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def _hash01(x):
    return _hash_u32(x).astype(jnp.float32) * (1.0 / 4294967296.0)


def stars_radiance(sky, d: Vec3):
    """Procedural star field: a lat-long hash grid (STARS_GRID cells per
    axis); each cell holds at most one star whose presence probability gives
    ~stars_count stars total (reference: sky.cuh procedural stars with
    per-cell offsets, device_utils.h STARS_GRID_LD)."""
    u = jnp.arctan2(d.z, d.x) * (0.5 / jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(d.y, -1.0, 1.0)) * (1.0 / jnp.pi)
    gx = jnp.clip((u * STARS_GRID).astype(jnp.int32), 0, STARS_GRID - 1)
    gy = jnp.clip((v * STARS_GRID).astype(jnp.int32), 0, STARS_GRID - 1)
    cell = (gy * STARS_GRID + gx).astype(jnp.uint32)
    seed = jnp.uint32(sky.stars_seed)
    h0 = _hash_u32(cell * jnp.uint32(0x9E3779B9) + seed)
    p_star = jnp.clip(
        sky.stars_count.astype(jnp.float32) / (STARS_GRID * STARS_GRID), 0.0, 1.0
    )
    present = _hash01(h0) < p_star
    # star sub-position within the cell
    su = (gx.astype(jnp.float32) + _hash01(h0 + 1)) / STARS_GRID
    sv = (gy.astype(jnp.float32) + _hash01(h0 + 2)) / STARS_GRID
    phi = (su - 0.5) * (2.0 * jnp.pi)
    theta = sv * jnp.pi
    sd = Vec3(
        jnp.cos(phi) * jnp.sin(theta), jnp.cos(theta), jnp.sin(phi) * jnp.sin(theta)
    )
    cos_d = jnp.clip(vdot(d, sd), -1.0, 1.0)
    ang = jnp.sqrt(jnp.maximum(2.0 * (1.0 - cos_d), 0.0))  # ~ angle for small a
    radius = 3e-4 * (0.5 + _hash01(h0 + 3))
    glow = jnp.exp(-(ang * ang) / jnp.maximum(2.0 * radius * radius, 1e-12))
    brightness = (0.2 + 0.8 * _hash01(h0 + 4) ** 4) * sky.stars_intensity
    i = jnp.where(present, glow * brightness, 0.0)
    # slight blue-white color variation
    warm = _hash01(h0 + 5)
    return i * (0.8 + 0.4 * warm), i, i * (1.2 - 0.4 * warm)


def moon_radiance(sky, d: Vec3):
    """Sun-lit moon disc: sphere normal from the disc parametrization gives
    the phase for free; albedo gets procedural crater mottling (the reference
    samples embedded albedo/normal textures, sky.cuh moon path)."""
    md = Vec3(sky.moon_dir[0], sky.moon_dir[1], sky.moon_dir[2])
    cos_m = vdot(d, md)
    in_disc = cos_m >= MOON_COS_RADIUS
    # tangent frame around the moon direction: cross with (0,1,0), or with
    # (1,0,0) when the moon is near the zenith/nadir
    up = jnp.where(jnp.abs(sky.moon_dir[1]) < 0.99, 1.0, 0.0)
    tx = normalize(Vec3(
        -md.z * up,
        md.z * (1.0 - up),
        md.x * up - md.y * (1.0 - up),
    ))
    ty = Vec3(
        md.y * tx.z - md.z * tx.y,
        md.z * tx.x - md.x * tx.z,
        md.x * tx.y - md.y * tx.x,
    )
    # disc-local coordinates in units of the angular radius
    lx = vdot(d, tx) / MOON_ANGULAR_RADIUS
    ly = vdot(d, ty) / MOON_ANGULAR_RADIUS
    r2 = jnp.clip(lx * lx + ly * ly, 0.0, 1.0)
    lz = jnp.sqrt(1.0 - r2)
    # sphere normal in world space (toward the viewer at the limb)
    n = Vec3(
        tx.x * lx + ty.x * ly - md.x * lz,
        tx.y * lx + ty.y * ly - md.y * lz,
        tx.z * lx + ty.z * ly - md.z * lz,
    )
    sun = sun_dir_vec(sky)
    lambert = jnp.maximum(vdot(n, sun), 0.0)
    # crater mottling
    cell = ((lx * 8.0 + sky.moon_tex_offset).astype(jnp.int32) * 37
            + (ly * 8.0).astype(jnp.int32) * 101).astype(jnp.uint32)
    mottle = 0.7 + 0.3 * _hash01(cell)
    radiance = jnp.where(
        in_disc, lambert * mottle * (MOON_ALBEDO / jnp.pi) * SUN_IRRADIANCE, 0.0
    )
    return radiance, in_disc


def sample_env_spec_rows(sky, d: Vec3):
    """Bilinear fetch of the 8-band spectral env (quad-row layout, ONE
    gather — the spectral twin of sample_env_rows). Returns [N, 8]."""
    h = sky.env_spec_h.astype(jnp.float32)
    w = sky.env_spec_w.astype(jnp.float32)
    wi = sky.env_spec_w
    theta = jnp.arccos(jnp.clip(d.y, -1.0, 1.0))
    phi = jnp.arctan2(d.z, d.x) % (2.0 * jnp.pi)
    fy = jnp.clip(theta * (1.0 / jnp.pi) * h - 0.5, 0.0, h - 1.001)
    fx = phi * (0.5 / jnp.pi) * w - 0.5
    x0f = jnp.floor(fx)
    x0 = x0f.astype(jnp.int32) % wi
    y0 = jnp.clip(fy.astype(jnp.int32), 0, sky.env_spec_h - 2)
    wy = (fy - y0.astype(jnp.float32))[:, None]
    wx = (fx - x0f)[:, None]
    r0 = sky.env_spec_rows[y0 * wi + x0]        # [N, 32] — the one gather
    top = r0[:, 0:8] * (1.0 - wx) + r0[:, 8:16] * wx
    bot = r0[:, 16:24] * (1.0 - wx) + r0[:, 24:32] * wx
    return top * (1.0 - wy) + bot * wy


def sky_radiance_spectral(sky, direction: Vec3, lam3):
    """Environment radiance at the three hero wavelengths (no solar disc —
    the integrator pairs the disc with the sun strategy itself).

    DEFAULT skies with a spectral bake sample the true 8-band atmosphere
    (reference: sky.cuh 8-wavelength path); HDRI/user/constant skies uplift
    their RGB radiance (ops/spectral.py). Returns a 3-slot tuple of [N]
    radiances matching the integrator's channel slots.
    """
    from .spectral import sample_spectrum_bands, uplift

    d = direction
    has_spec = int(sky.env_spec_rows.shape[0]) > 1  # static
    if has_spec:
        bands = sample_env_spec_rows(sky, d)        # [N, 8]
        dome = tuple(sample_spectrum_bands(bands, lam) for lam in lam3)
    else:
        r, g, b = sample_env_rows(sky, d)
        dome = tuple(uplift(r, g, b, lam) for lam in lam3)

    # moon + stars (DEFAULT mode): uplifted RGB, occluded regions as in
    # sky_radiance
    moon, in_moon = moon_radiance(sky, d)
    sr, sg, sb = stars_radiance(sky, d)
    cos_sun = vdot(d, sun_dir_vec(sky))
    in_disc = cos_sun >= SUN_COS_RADIUS
    block = in_moon | in_disc
    sr = jnp.where(block, 0.0, sr)
    sg = jnp.where(block, 0.0, sg)
    sb = jnp.where(block, 0.0, sb)
    is_default = (sky.mode == 0).astype(jnp.float32)
    out = []
    for j, lam in enumerate(lam3):
        extra = (uplift(sr, sg, sb, lam) + moon) * is_default
        val = dome[j] + extra
        is_const = sky.mode == 2
        const_j = uplift(sky.constant_color[0], sky.constant_color[1],
                         sky.constant_color[2], lam)
        out.append(jnp.where(is_const, const_j, val))
    return tuple(out)


def sun_radiance_spectral(sky, lam3):
    """Solar-disc radiance at the hero wavelengths: the banded spectrum
    when the spectral bake exists, else the uplifted RGB disc radiance."""
    from .spectral import sample_spectrum_bands, uplift

    has_spec = int(sky.env_spec_rows.shape[0]) > 1  # static
    zero_if_const = jnp.where(sky.mode == 2, 0.0, 1.0)
    out = []
    for lam in lam3:
        if has_spec:
            v = sample_spectrum_bands(sky.sun_disc_spec[None, :], lam)
        else:
            v = uplift(sky.sun_disc_radiance[0], sky.sun_disc_radiance[1],
                       sky.sun_disc_radiance[2], lam)
        out.append(v * zero_if_const)
    return tuple(out)


def aerial_fetch(sky, direction: Vec3, dist):
    """Aerial-perspective lookup: (transmittance rgb, inscatter rgb) for a
    view segment of length `dist` km-equivalents (world units are treated
    as metres; the bake uses km — callers pass dist * 1e-3).

    ONE row gather per lane: the row carries the whole log-distance curve
    (ops/atmosphere.bake_aerial_rows layout), lerped in-register.
    """
    from .atmosphere import (
        AERIAL_D_MAX,
        AERIAL_D_MIN,
        AERIAL_ND,
        AERIAL_NS,
        AERIAL_NU,
    )

    mu = jnp.clip(direction.y, -1.0, 1.0)
    mi = jnp.clip(((mu + 1.0) * 0.5 * AERIAL_NU).astype(jnp.int32),
                  0, AERIAL_NU - 1)
    # sun-relative azimuth
    sx, sz = sky.sun_dir[0], sky.sun_dir[2]
    az_v = jnp.arctan2(direction.z, direction.x)
    az_s = jnp.arctan2(sz, sx)
    rel = (az_v - az_s) % (2.0 * jnp.pi)
    si = jnp.clip((rel * (AERIAL_NS / (2.0 * jnp.pi))).astype(jnp.int32),
                  0, AERIAL_NS - 1)
    from .rowops import gather_planar

    row = gather_planar(sky.aerial_rows, mi * AERIAL_NS + si)  # [128, N]
    # log-distance lerp
    logr = jnp.log(jnp.clip(dist, AERIAL_D_MIN, AERIAL_D_MAX) / AERIAL_D_MIN)
    t = logr / jnp.log(AERIAL_D_MAX / AERIAL_D_MIN) * (AERIAL_ND - 1)
    k0 = jnp.clip(t.astype(jnp.int32), 0, AERIAL_ND - 2)
    w = (t - k0.astype(jnp.float32))[None, :]
    # one-hot knot mix over planar rows (avoids per-lane gathers; the
    # Pallas transpose above keeps every read here a flat [N] row)
    ks = jnp.arange(AERIAL_ND, dtype=jnp.int32)[:, None]
    sel0 = (ks == k0[None, :]).astype(jnp.float32)
    sel1 = (ks == (k0 + 1)[None, :]).astype(jnp.float32)
    sel = sel0 * (1.0 - w) + sel1 * w                # [ND, N]

    def curve(base):
        # bake layout: col = base + knot*3 + component
        return (
            jnp.sum(row[base + 0:base + 3 * AERIAL_ND:3] * sel, axis=0),
            jnp.sum(row[base + 1:base + 3 * AERIAL_ND:3] * sel, axis=0),
            jnp.sum(row[base + 2:base + 3 * AERIAL_ND:3] * sel, axis=0),
        )

    # short segments fade linearly below the first knot
    fade = jnp.clip(dist / AERIAL_D_MIN, 0.0, 1.0)
    ins = tuple(c * fade for c in curve(0))
    tr = tuple(1.0 + (c - 1.0) * fade for c in curve(48))
    return tr, ins


def sample_env_direction(sky, pixel_id, sample_id, depth, bn=None):
    """Draw a direction toward the environment by cell importance
    (reference: direct_lighting ambient + sky_hdri.cuh importance).

    One alias-row gather picks a lat-long cell; the direction is uniform
    within the cell (piecewise-constant pdf). Returns (dir Vec3, pdf_sr [N]).
    Consumes RandomTarget.LIGHT_AMBIENT sub-streams 2*depth (select) and
    2*depth+1 (jitter).
    """
    from .random import RandomTarget, random_2d

    k = sky.env_alias_rows.shape[0]
    ch = sky.env_ch.astype(jnp.float32)
    cw = sky.env_cw.astype(jnp.float32)
    r = random_2d(RandomTarget.LIGHT_AMBIENT, pixel_id, sample_id, 2 * depth,
                  bn=bn)
    idx = jnp.minimum((r[..., 0] * k).astype(jnp.int32), k - 1)
    row = sky.env_alias_rows[idx]  # [N, 8]
    take_alias = r[..., 1] >= row[:, 0]
    cell = jax.lax.bitcast_convert_type(
        jnp.where(take_alias, row[:, 3], row[:, 1]), jnp.int32)
    pdf_sr = jnp.where(take_alias, row[:, 4], row[:, 2])
    cy = (cell // sky.env_cw).astype(jnp.float32)
    cx = (cell % sky.env_cw).astype(jnp.float32)
    j = random_2d(RandomTarget.LIGHT_AMBIENT, pixel_id, sample_id,
                  2 * depth + 1, bn=bn)
    # uniform within the cell's solid angle: phi uniform, cos(theta) uniform
    # between the band edges (the pdf/sr is constant per cell by build)
    phi = (cx + j[..., 0]) / cw * (2.0 * jnp.pi)
    ct0 = jnp.cos(cy / ch * jnp.pi)
    ct1 = jnp.cos((cy + 1.0) / ch * jnp.pi)
    ct = ct0 + (ct1 - ct0) * j[..., 1]
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    d = Vec3(jnp.cos(phi) * st, ct, jnp.sin(phi) * st)
    return d, pdf_sr


def env_pdf(sky, d: Vec3) -> jnp.ndarray:
    """pdf/sr that sample_env_direction would have produced `d` — the MIS
    counterpart for BSDF-sampled rays that escape to the sky."""
    ch = sky.env_ch
    cw = sky.env_cw
    theta = jnp.arccos(jnp.clip(d.y, -1.0, 1.0))
    phi = jnp.arctan2(d.z, d.x) % (2.0 * jnp.pi)
    cy = jnp.clip((theta * (1.0 / jnp.pi) * ch.astype(jnp.float32))
                  .astype(jnp.int32), 0, ch - 1)
    cx = jnp.clip((phi * (0.5 / jnp.pi) * cw.astype(jnp.float32))
                  .astype(jnp.int32), 0, cw - 1)
    return sky.env_cell_pdf[cy * cw + cx]


def sun_solid_angle_radiance(sky) -> jnp.ndarray:
    """Mean solar-disc radiance used by NEE (transmittance-tinted)."""
    return sky.sun_disc_radiance * jnp.where(sky.mode == 2, 0.0, 1.0)
