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

import jax.numpy as jnp

from .sh import eval_sh_components
from .vec import Vec3, dot as vdot

# Sun angular radius as seen from earth (~0.2667 deg).
SUN_COS_RADIUS = 0.99998869
SUN_ANGULAR_RADIUS = 0.004675  # radians
_SUN_SOLID_ANGLE = 6.87e-5  # 2π(1-cos θ_sun)

SUN_IRRADIANCE = 1.25  # top-of-atmosphere, at exposure-1 calibration
SUN_RADIANCE = SUN_IRRADIANCE / _SUN_SOLID_ANGLE


def sun_dir_vec(sky) -> Vec3:
    return Vec3(sky.sun_dir[0], sky.sun_dir[1], sky.sun_dir[2])


def sky_radiance(sky, direction: Vec3, include_sun=True) -> Vec3:
    """Environment radiance for escaping rays → RGB Vec3 of [N] channels.

    include_sun: whether the solar disc contributes (the integrator handles
    disc MIS itself and passes False, adding the disc explicitly).
    """
    d = direction
    # SH-6 evaluation: gather-free sky (an env-map fetch is an O(N·texels)
    # table scan on TPU; the smooth, disc-free sky fits SH well).
    r, g, b = eval_sh_components(sky.sh_coeffs, d.x, d.y, d.z, jnp)

    cos_sun = vdot(d, sun_dir_vec(sky))
    in_disc = cos_sun >= SUN_COS_RADIUS
    center = jnp.clip((cos_sun - SUN_COS_RADIUS) / (1.0 - SUN_COS_RADIUS), 0.0, 1.0)
    limb = jnp.where(in_disc, 0.3 + 0.7 * jnp.sqrt(center), 0.0)
    include = jnp.asarray(include_sun)
    disc = limb * include
    r = r + disc * sky.sun_disc_radiance[0]
    g = g + disc * sky.sun_disc_radiance[1]
    b = b + disc * sky.sun_disc_radiance[2]

    is_const = sky.mode == 2
    return Vec3(
        jnp.where(is_const, sky.constant_color[0], r),
        jnp.where(is_const, sky.constant_color[1], g),
        jnp.where(is_const, sky.constant_color[2], b),
    )


def sun_solid_angle_radiance(sky) -> jnp.ndarray:
    """Mean solar-disc radiance used by NEE (transmittance-tinted)."""
    return sky.sun_disc_radiance * jnp.where(sky.mode == 2, 0.0, 1.0)
