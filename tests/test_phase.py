"""Jendersie-d'Eon droplet phase (ops/phase.py; published SIGGRAPH 2023
fits — reference implementation cuda/math.cuh:1169-1335).

Contract: the two-lobe mix integrates to 1 over the sphere for all
diameter regimes; the closed-form sampler reproduces the distribution's
mean cosine; direction sampling stays unit-length and concentrates
forward for large droplets.
"""

import numpy as np
import jax.numpy as jnp

from luminary_tpu.ops.phase import (
    je_params,
    je_phase,
    je_sample_direction,
)
from luminary_tpu.ops.vec import Vec3


DIAMETERS = (0.05, 0.8, 3.0, 10.0, 50.0)


def test_phase_normalizes_over_sphere():
    # ∫ phase dΩ = 2π ∫ phase(cos) dcos = 1. Large droplets have a forward
    # peak of width ~(1-g) ≈ 2e-3 — refine the grid near cos=1 (a uniform
    # grid overestimates the peak by ~35% at d=50).
    body = np.linspace(-1.0, 0.99, 100001)
    peak = 1.0 - np.logspace(-9, -2, 100001)[::-1]
    cos = np.unique(np.concatenate([body, peak, [1.0]]))
    for d in DIAMETERS:
        p = np.asarray(je_phase(jnp.asarray(cos), d))
        integral = 2.0 * np.pi * np.trapezoid(p, cos)
        assert abs(integral - 1.0) < 2e-2, (d, integral)


def test_sampler_matches_mean_cosine():
    n = 1 << 16
    rng = np.random.default_rng(5)
    fwd = Vec3(jnp.zeros((n,)), jnp.zeros((n,)), jnp.ones((n,)))
    body = np.linspace(-1.0, 0.99, 100001)
    peak = 1.0 - np.logspace(-9, -2, 100001)[::-1]
    cos_grid = np.unique(np.concatenate([body, peak, [1.0]]))
    for d in (0.8, 10.0, 50.0):
        wi = je_sample_direction(
            fwd, d,
            jnp.asarray(rng.random(n, np.float32)),
            jnp.asarray(rng.random(n, np.float32)),
            jnp.asarray(rng.random(n, np.float32)),
        )
        lens = np.asarray(wi.x)**2 + np.asarray(wi.y)**2 + np.asarray(wi.z)**2
        np.testing.assert_allclose(lens, 1.0, atol=1e-4)
        mean_cos = float(np.asarray(wi.z).mean())
        p = np.asarray(je_phase(jnp.asarray(cos_grid), d))
        expect = 2.0 * np.pi * np.trapezoid(p * cos_grid, cos_grid)
        assert abs(mean_cos - expect) < 0.02, (d, mean_cos, expect)


def test_large_droplets_scatter_forward():
    g50 = je_params(50.0)[0]
    g_small = je_params(0.05)[0]
    assert g50 > 0.95 and g_small < 0.1
