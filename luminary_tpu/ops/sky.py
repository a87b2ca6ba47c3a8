"""Sky radiance evaluation.

The reference implements a Hillaire-2020 LUT-driven spectral atmosphere with
sun/moon/stars (reference: src/luminary/device/cuda/sky.cuh, device_sky.c).
Build-out here happens in stages:

  stage 1 (this file): CONSTANT_COLOR mode exactly, plus a cheap analytic
  single-scatter approximation for DEFAULT mode (Rayleigh+Mie with an
  airmass-based transmittance and sun disk with limb darkening) so the
  end-to-end integrator has a physically plausible environment;
  stage 2: Hillaire transmittance/multiscatter LUTs as jitted precompute
  (ops/sky_lut.py) driving this evaluation;
  stage 3: HDRI bake + stars + moon.

Physical constants follow the reference's scene scale: 1 unit = 1 m at sky
scale after the geometry_offset is applied.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math3

# Sun angular radius as seen from earth (~0.2667 deg), reference sky_defines.h
# derives the same from SKY_SUN_RADIUS / SKY_SUN_DISTANCE.
SUN_COS_RADIUS = 0.99998869  # cos(0.2725 deg)
SUN_ANGULAR_RADIUS = 0.004675  # radians

# Sea-level scattering coefficients (m^-1), standard clear-sky values.
_BETA_RAYLEIGH = jnp.asarray([5.802e-6, 13.558e-6, 33.1e-6])
_BETA_MIE = jnp.asarray([3.996e-6, 3.996e-6, 3.996e-6])
_BETA_OZONE = jnp.asarray([0.650e-6, 1.881e-6, 0.085e-6])

# Effective path-length scales (m) for the flat-atmosphere approximation.
_H_RAYLEIGH = 8000.0
_H_MIE = 1200.0

# Calibration: with exposure 1.0, a sun-lit 0.5-albedo diffuse surface lands
# near mid-gray. E_sun = L_disc * Ω_disc is the normal-incidence irradiance;
# the disc radiance follows from the solid angle. The real sun:sky-zenith
# luminance ratio (~2e5:1) is preserved by the inscatter terms below.
SUN_IRRADIANCE = 1.25
_SUN_SOLID_ANGLE = 6.87e-5  # 2π(1-cos θ_sun)
SUN_RADIANCE = SUN_IRRADIANCE / _SUN_SOLID_ANGLE


def _airmass(cos_zenith: jnp.ndarray) -> jnp.ndarray:
    """Kasten-Young style relative airmass, clamped below the horizon (the
    formula's 93.885° validity bound is enforced to keep pow() finite)."""
    cz = jnp.clip(cos_zenith, -0.2, 1.0)
    zen_deg = jnp.degrees(jnp.arccos(jnp.clip(cz, -1.0, 1.0)))
    base = jnp.maximum(93.885 - zen_deg, 0.5)
    return 1.0 / jnp.maximum(cz + 0.15 * jnp.power(base, -1.253), 0.02)


def _rayleigh_phase(cos_theta: jnp.ndarray) -> jnp.ndarray:
    return 3.0 / (16.0 * jnp.pi) * (1.0 + cos_theta * cos_theta)


def _mie_phase(cos_theta: jnp.ndarray, g: float = 0.8) -> jnp.ndarray:
    """Cornette-Shanks."""
    g2 = g * g
    num = 3.0 * (1.0 - g2) * (1.0 + cos_theta * cos_theta)
    den = 8.0 * jnp.pi * (2.0 + g2) * jnp.power(1.0 + g2 - 2.0 * g * cos_theta, 1.5)
    return num / jnp.maximum(den, 1e-12)


def sky_transmittance(direction: jnp.ndarray, base_density: jnp.ndarray) -> jnp.ndarray:
    """Approximate transmittance along a view ray leaving the atmosphere."""
    am = _airmass(direction[..., 1])[..., None]
    tau = (
        _BETA_RAYLEIGH * _H_RAYLEIGH + _BETA_MIE * _H_MIE + _BETA_OZONE * _H_RAYLEIGH * 0.3
    ) * base_density
    return jnp.exp(-tau * am)


def sky_radiance(
    sky,
    direction: jnp.ndarray,
    include_sun: jnp.ndarray | bool = True,
) -> jnp.ndarray:
    """Environment radiance for rays escaping the scene. [N,3].

    Args:
      sky: DeviceSky pack.
      direction: unit view directions [N, 3].
      include_sun: whether the solar disc contributes (NEE turns this off for
        secondary rays to avoid double counting until MIS lands).
    """
    d = direction
    cos_sun = math3.dot(d, sky.sun_dir)

    # --- scattering (DEFAULT mode approximation) ---
    am_view = _airmass(d[..., 1])[..., None]
    density = sky.base_density
    tau_r = _BETA_RAYLEIGH * _H_RAYLEIGH * density
    tau_m = _BETA_MIE * _H_MIE * density
    t_view = jnp.exp(-(tau_r + tau_m) * am_view)

    # Sun transmittance modulates in-scattered light.
    t_sun = sky_transmittance(jnp.broadcast_to(sky.sun_dir, d.shape), density)

    phase_r = _rayleigh_phase(cos_sun)[..., None]
    phase_m = _mie_phase(cos_sun)[..., None]
    # Single-scatter albedo integral approximation: S = phase * beta_s/beta_e * (1 - T_view)
    beta_e = tau_r + tau_m
    scatter = (phase_r * tau_r + phase_m * tau_m) / jnp.maximum(beta_e, 1e-9)
    inscatter = scatter * (1.0 - t_view) * t_sun * SUN_IRRADIANCE

    # Below-horizon fade to ground color.
    ground = (
        jnp.asarray([0.3, 0.25, 0.2])
        * jnp.maximum(sky.sun_dir[1], 0.0)
        * 0.1
        * SUN_IRRADIANCE
    )
    horizon_t = jnp.clip(d[..., 1:2] * 20.0 + 0.5, 0.0, 1.0)
    radiance = inscatter * horizon_t + ground * (1.0 - horizon_t)

    # --- solar disc with limb darkening ---
    in_disc = cos_sun >= SUN_COS_RADIUS
    # limb darkening: mu = cos of angle from disc center normalized
    center = jnp.clip(
        (cos_sun - SUN_COS_RADIUS) / (1.0 - SUN_COS_RADIUS), 0.0, 1.0
    )
    limb = 0.3 + 0.7 * jnp.sqrt(center)
    sun_disc = (
        in_disc[..., None]
        * limb[..., None]
        * t_view
        * SUN_RADIANCE
    )
    include = jnp.asarray(include_sun)
    if include.ndim > 0:
        include = include[..., None]
    radiance = radiance + jnp.where(include & (d[..., 1:2] > -0.1), sun_disc, 0.0)
    radiance = radiance * sky.sun_strength

    # --- mode select (reference: LuminarySkyMode) ---
    constant = jnp.broadcast_to(sky.constant_color, radiance.shape)
    is_constant = sky.mode == 2
    return jnp.where(is_constant, constant, radiance)


def sun_solid_angle_radiance(sky) -> jnp.ndarray:
    """Radiance of the solar disc used by NEE (flat disc approximation)."""
    return jnp.asarray([1.0, 1.0, 1.0]) * SUN_RADIANCE * sky.sun_strength * jnp.where(sky.mode == 2, 0.0, 1.0)
