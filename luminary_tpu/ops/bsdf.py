"""BSDF sampling and evaluation.

Stage 1: Lambert diffuse (cosine-weighted) — enough for the end-to-end slice.
Stage 2 (ops/ggx.py): the reference's full GGX microfacet stack — bounded-VNDF
reflection sampling, spherical-cap VNDF refraction, conductor/dielectric
fresnel, and LUT-based multiscatter energy compensation (reference:
src/luminary/device/cuda/bsdf.cuh, bsdf_utils.cuh).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math3
from .random import RandomTarget, random_2d


def cosine_sample_hemisphere(normal: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted direction about `normal` from uniforms r2 [...,2]."""
    t, b = math3.orthonormal_basis(normal)
    phi = 2.0 * jnp.pi * r2[..., 0]
    sr = jnp.sqrt(r2[..., 1])
    x = jnp.cos(phi) * sr
    y = jnp.sin(phi) * sr
    z = jnp.sqrt(jnp.maximum(1.0 - r2[..., 1], 0.0))
    return math3.normalize(
        t * x[..., None] + b * y[..., None] + normal * z[..., None]
    )


def lambert_sample(normal, albedo, pixel_id, sample_id, depth):
    """Sample a diffuse bounce.

    Returns (direction, throughput_multiplier). With cosine-weighted sampling
    the cos/pdf terms cancel, leaving just the albedo.
    """
    r2 = random_2d(RandomTarget.BSDF_REFLECTION, pixel_id, sample_id, depth)
    direction = cosine_sample_hemisphere(normal, r2)
    return direction, albedo


def lambert_eval(normal, direction_out, albedo):
    """BRDF * cos for an explicit direction (NEE). Returns [...,3] weight."""
    cos_theta = jnp.maximum(math3.dot(normal, direction_out), 0.0)
    return albedo * (cos_theta / jnp.pi)[..., None]
