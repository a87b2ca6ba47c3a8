"""Analytic ocean intersection: Lipschitz-bounded heightfield raymarch.

Reference equivalent: cuda/ocean_utils.cuh (ocean_intersection_solver /
ocean_ray_marcher — the reference never tessellates; it sphere-traces the
procedural heightfield with a slope bound and refines). This module is the
TPU re-design: every lane marches in lockstep with masked updates inside a
`lax.fori_loop`, with all FBM evaluations fused by XLA (no gathers — pure
VPU work), so the cost is iterations x octaves of hash arithmetic.

Two entry points:

- `ocean_intersect`: closest-hit sphere trace with a proximity criterion
  and an "escape" guard so rays that START on the surface (refraction
  bounce offsets) must first leave the surface shell before a hit counts.
- `ocean_crosses`: shadow-class test via fixed-step SIGN-CHANGE detection.
  Proximity would false-positive the caustic visibility segments, which by
  construction END exactly on the surface (ops/caustics.py connects x→P
  with P on the interface); a sign flip only triggers on a true crossing.

The surface is `y = height + amplitude * fbm(x·f, z·f)` shared bit-exactly
with the caustic sampler and the (opt-in) tessellated mesh
(ops/procedural.py ocean_fbm_jnp / ocean_height_normal_jnp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .procedural import ocean_fbm_jnp, ocean_height_normal_jnp
from .vec import Vec3

# Lipschitz bound of ocean_fbm_jnp in noise coordinates: per octave the
# smoothstep-bilinear value-noise gradient is <= 1.5 (smoothstep peak slope)
# x value range 1.0, scaled by amp_o * freq_o and the 1/norm normalizer.
# amp = 0.5^o, freq = 2.1^o, 5 octaves: 1.5 * sum(1.05^o) / 0.96875 ≈ 8.56.
_FBM_LIPSCHITZ = 8.56
# |fbm| <= 0.5 exactly (each octave contributes amp*0.5, normalized).
_FBM_RANGE = 0.5


def _height(water, px, pz):
    f = water.frequency
    return water.height + water.amplitude * ocean_fbm_jnp(px * f, pz * f)


def _band_clip(water, origin: Vec3, direction: Vec3, t_max):
    """Clip the ray against the wave band [height-A/2-m, height+A/2+m].
    Returns (t0, t1, feasible)."""
    band = _FBM_RANGE * water.amplitude + 1e-4
    hi = water.height + band
    lo = water.height - band
    dy = direction.y
    dy_s = jnp.where(jnp.abs(dy) < 1e-9, 1e-9, dy)
    t_hi = (hi - origin.y) / dy_s
    t_lo = (lo - origin.y) / dy_s
    t_enter = jnp.minimum(t_hi, t_lo)
    t_exit = jnp.maximum(t_hi, t_lo)
    inside = (origin.y > lo) & (origin.y < hi)
    # a horizontal ray inside the band never leaves it: t_exit from the
    # clamped dy is huge of either sign — guard with |dy| directly
    horiz = jnp.abs(dy) < 1e-9
    t0 = jnp.where(inside, 0.0, jnp.maximum(t_enter, 0.0))
    t1 = jnp.where(horiz & inside, t_max, jnp.minimum(t_exit, t_max))
    t1 = jnp.minimum(t1, t_max)
    feasible = (t1 > t0) & (jnp.where(horiz, inside, t_exit > 0.0))
    return t0, t1, feasible


def ocean_intersect(water, origin: Vec3, direction: Vec3, t_max,
                    active, iters: int = 64):
    """Closest intersection with the analytic ocean surface.

    Returns (found: bool [N], t: f32 [N]). `t` is just shy of the surface
    (proximity stop), so the caller's usual geometric-epsilon offsets apply
    unchanged. Lanes that exhaust `iters` without converging (near-grazing
    rays) report no hit, like the reference's bounded marcher.
    """
    t0, t1, feasible = _band_clip(water, origin, direction, t_max)
    feasible = feasible & active
    dxz = jnp.sqrt(direction.x * direction.x + direction.z * direction.z)
    slope = water.amplitude * water.frequency * _FBM_LIPSCHITZ
    denom = jnp.abs(direction.y) + slope * dxz + 1e-9
    eps_g = 1e-3 * water.amplitude + 1e-5

    def g_at(t):
        px = origin.x + direction.x * t
        py = origin.y + direction.y * t
        pz = origin.z + direction.z * t
        return py - _height(water, px, pz)

    g0 = g_at(t0)
    st = dict(
        t=t0,
        done=~feasible,
        found=jnp.zeros_like(feasible),
        # rays starting inside the surface shell (bounce offsets) must
        # leave it before a proximity hit counts
        escaped=jnp.abs(g0) > 2.0 * eps_g,
    )

    def body(_, st):
        g = g_at(st["t"])
        near = jnp.abs(g) < eps_g
        hit_now = near & st["escaped"] & ~st["done"]
        step = jnp.maximum(jnp.abs(g) / denom, 1e-5)
        t_new = st["t"] + step
        out = t_new > t1
        return dict(
            t=jnp.where(st["done"] | hit_now, st["t"], t_new),
            done=st["done"] | hit_now | out,
            found=st["found"] | hit_now,
            escaped=st["escaped"] | (jnp.abs(g) > 2.0 * eps_g),
        )

    st = jax.lax.fori_loop(0, iters, body, st)
    # Far-field fallback: grazing rays can exhaust `iters` while still
    # inside the band (the Lipschitz step is ~|g|/L per iteration, so a
    # near-horizontal ray needs hundreds of steps to reach the horizon).
    # Waves are sub-pixel at those distances — intersect the MEAN plane
    # y = height instead of reporting a miss (which would show sky-ground
    # color across the whole far ocean).
    exhausted = feasible & ~st["done"]
    dy_s = jnp.where(jnp.abs(direction.y) < 1e-9, 1e-9, direction.y)
    t_plane = (water.height - origin.y) / dy_s
    plane_ok = exhausted & (t_plane >= st["t"]) & (t_plane <= t1)
    found = st["found"] | plane_ok
    t = jnp.where(plane_ok, t_plane, st["t"])
    return found, t


def ocean_crosses(water, origin: Vec3, direction: Vec3, t_len,
                  active, steps: int = 16):
    """True where the segment [eps, t_len] crosses the surface (shadow
    test). Fixed-step sign-change detection: immune to endpoints that sit
    exactly on the interface (caustic visibility segments), at the cost of
    possibly stepping over a sub-step wave crest — the same approximation
    the reference's fast shadow path makes."""
    t0, t1, feasible = _band_clip(water, origin, direction, t_len)
    feasible = feasible & active & (t_len > 1e-6)
    span = jnp.maximum(t1 - t0, 0.0)
    # inset the endpoints so on-surface start/end points stay on their side
    inset = jnp.minimum(0.02 * span, 1e-2)
    ta = t0 + inset
    dt = (span - 2.0 * inset) / float(steps)
    dt = jnp.maximum(dt, 0.0)

    def g_at(t):
        px = origin.x + direction.x * t
        py = origin.y + direction.y * t
        pz = origin.z + direction.z * t
        return py - _height(water, px, pz)

    s0 = g_at(ta) >= 0.0
    crossed = jnp.zeros_like(feasible)

    def body(i, carry):
        crossed = carry
        t = ta + dt * (i + 1.0)
        flip = (g_at(t) >= 0.0) != s0
        return crossed | flip

    crossed = jax.lax.fori_loop(0, steps, body, crossed)
    return crossed & feasible


def ocean_normal(water, px, pz):
    """Unit surface normal at (x, z) — shared with the caustic sampler."""
    _, n = ocean_height_normal_jnp(water, px, pz)
    return Vec3(n[0], n[1], n[2])
