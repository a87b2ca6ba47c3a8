"""Ocean sun caustics: RIS-sampled connection points on the wavy interface.

TPU re-design of the reference's caustic connection solver (reference:
src/luminary/device/cuda/caustics.cuh:1-166 + direct_lighting.cuh:121-243
— RIS-sampled connection points on the water surface for sun light through
the interface). The estimator here is plain area-measure NEE with the
procedural surface acting as the "light": a candidate point P on the
surface contributes iff the direction x→P, refracted at the wave normal
from water into air, lands inside the solar disc — the caustic structure
emerges from that alignment set. Candidates are drawn uniformly in a disk
around the flat-interface refraction point and RIS-resampled by a smooth
alignment×Fresnel target; only the winner pays the exact disc test and the
two visibility rays. Unbiased: the target only shapes candidate quality.

The ocean surface itself is tessellated geometry with a rough-dielectric
material; the caustic strategy owns the x→surface→sun-disc transport, and
the integrator suppresses the BSDF path's disc hit after an upward ocean
refraction (render/wavefront.py ocean_exit flag) so the two do not double
count. The smooth-interface refraction used here sharpens the surface's
0.05 roughness slightly — the reference's analytic ocean is smooth too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .procedural import ocean_height_normal_jnp
from .random import RandomTarget, random_2d
from .sky import SUN_COS_RADIUS
from .vec import Vec3, dot

# Smooth RIS target width: exp(-(1 - align)/TAU) ≈ a 2.5° attraction basin
# around perfect sun alignment (the exact disc is 0.27° — RIS corrects).
_TAU = 1e-3


def _refract_up(wx, wy, wz, nx, ny, nz, eta_rel):
    """Refract a water-side direction (toward the surface) into air.
    eta_rel = n_water / n_air. Returns (tx, ty, tz, valid)."""
    c1 = wx * nx + wy * ny + wz * nz
    c1 = jnp.clip(c1, -1.0, 1.0)
    sin2_2 = eta_rel * eta_rel * jnp.maximum(1.0 - c1 * c1, 0.0)
    valid = (sin2_2 < 1.0) & (c1 > 0.0)
    c2 = jnp.sqrt(jnp.maximum(1.0 - sin2_2, 0.0))
    k = c2 - eta_rel * c1
    tx = eta_rel * wx + k * nx
    ty = eta_rel * wy + k * ny
    tz = eta_rel * wz + k * nz
    inv = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-12))
    return tx * inv, ty * inv, tz * inv, valid


def sample_caustic_connection(water, sun_v: Vec3, x: Vec3,
                              pixel_id, sample_id, depth: int,
                              k_samples: int):
    """RIS over K surface connection points for an underwater vertex x.

    Returns (P Vec3, u Vec3 (unit x→P), dist [N], weight [N], valid [N]):
    `weight` is the full area-measure estimator factor
    Ft·cos_geo/dist² · πR²·Σp̂/(K·p̂_w) · [winner refracts into the disc];
    the caller multiplies f(x,u)·Le_sun·T_water·visibility.
    """
    n = x.x.shape[0]
    eta = water.ior  # n_water / n_air

    # flat-interface refracted sun direction (downward into water) gives
    # the disk center: the dominant connection sits on that line
    sy = jnp.clip(sun_v.y, 1e-3, 1.0)
    sin_air2 = jnp.maximum(1.0 - sy * sy, 0.0)
    sin_w2 = sin_air2 / (eta * eta)
    cos_w = jnp.sqrt(jnp.maximum(1.0 - sin_w2, 0.0))
    # horizontal unit of the sun direction
    sh = jnp.sqrt(jnp.maximum(sun_v.x**2 + sun_v.z**2, 1e-12))
    hx_s, hz_s = sun_v.x / sh, sun_v.z / sh
    w_depth = jnp.maximum(water.height - x.y, 0.05)
    # offset from x, along the surface, toward the sun azimuth
    tan_w = jnp.sqrt(sin_w2) / jnp.maximum(cos_w, 1e-3)
    cx = x.x + hx_s * tan_w * w_depth
    cz = x.z + hz_s * tan_w * w_depth
    r_disk = (water.caustics_scale * w_depth
              + 4.0 * water.amplitude + 0.5)
    pdf_a_inv = np.pi * r_disk * r_disk  # 1 / pdf_A

    wsum = jnp.zeros((n,), jnp.float32)
    sel_phat = jnp.zeros((n,), jnp.float32)
    sel_px = jnp.zeros((n,), jnp.float32)
    sel_pz = jnp.zeros((n,), jnp.float32)
    for k in range(k_samples):
        r2 = random_2d(RandomTarget.OCEAN_CAUSTICS, pixel_id, sample_id,
                       depth * 32 + k)
        rr = r_disk * jnp.sqrt(jnp.clip(r2[..., 0], 1e-6, 1.0))
        ph = 2.0 * np.pi * r2[..., 1]
        px = cx + rr * jnp.cos(ph)
        pz = cz + rr * jnp.sin(ph)
        py, (nx, ny, nz) = ocean_height_normal_jnp(water, px, pz)
        dx, dy_, dz = px - x.x, py - x.y, pz - x.z
        inv_d = jax.lax.rsqrt(jnp.maximum(
            dx * dx + dy_ * dy_ + dz * dz, 1e-8))
        ux, uy, uz = dx * inv_d, dy_ * inv_d, dz * inv_d
        tx, ty, tz, ok = _refract_up(ux, uy, uz, nx, ny, nz, eta)
        align = tx * sun_v.x + ty * sun_v.y + tz * sun_v.z
        # Schlick transmittance on the air side
        cos_air = jnp.clip(tx * nx + ty * ny + tz * nz, 0.0, 1.0)
        r0 = ((eta - 1.0) / (eta + 1.0)) ** 2
        ft = 1.0 - (r0 + (1.0 - r0) * (1.0 - cos_air) ** 5)
        phat = jnp.where(
            ok, ft * jnp.exp(-(1.0 - jnp.clip(align, -1.0, 1.0)) / _TAU),
            0.0)
        wsum = wsum + phat
        if k == 0:
            take = phat > 0.0
        else:
            rpick = random_2d(RandomTarget.OCEAN_CAUSTICS, pixel_id,
                              sample_id, depth * 32 + k + 16384)[..., 0]
            take = (rpick * wsum < phat) & (phat > 0.0)
        sel_phat = jnp.where(take, phat, sel_phat)
        sel_px = jnp.where(take, px, sel_px)
        sel_pz = jnp.where(take, pz, sel_pz)

    # winner: exact terms
    py, (nx, ny, nz) = ocean_height_normal_jnp(water, sel_px, sel_pz)
    dx, dy_, dz = sel_px - x.x, py - x.y, sel_pz - x.z
    dist = jnp.sqrt(jnp.maximum(dx * dx + dy_ * dy_ + dz * dz, 1e-8))
    inv_d = 1.0 / dist
    u = Vec3(dx * inv_d, dy_ * inv_d, dz * inv_d)
    tx, ty, tz, ok = _refract_up(u.x, u.y, u.z, nx, ny, nz, eta)
    align = tx * sun_v.x + ty * sun_v.y + tz * sun_v.z
    aligned = ok & (align >= SUN_COS_RADIUS)
    cos_air = jnp.clip(tx * nx + ty * ny + tz * nz, 0.0, 1.0)
    r0 = ((eta - 1.0) / (eta + 1.0)) ** 2
    ft = 1.0 - (r0 + (1.0 - r0) * (1.0 - cos_air) ** 5)
    cos_geo = jnp.abs(u.x * nx + u.y * ny + u.z * nz)
    valid = aligned & (wsum > 0.0) & (sel_phat > 0.0)
    weight = jnp.where(
        valid,
        ft * cos_geo * inv_d * inv_d * pdf_a_inv
        * wsum / (k_samples * jnp.maximum(sel_phat, 1e-20)),
        0.0,
    )
    p = Vec3(sel_px, py, sel_pz)
    return p, u, dist, weight, valid
