"""The wavefront path-tracing integrator.

TPU translation of the reference's per-sample device loop (reference:
src/luminary/device/device_renderer.c:59-131 — the per-depth kernel queue
RAYTRACE → SORT → GEOMETRY/... shade → SHADOW → accumulate). On TPU the
persistent-thread task queues become a dense SoA wavefront of one lane per
pixel: each depth iteration traces the whole wavefront, shades all lanes
masked by liveness, and NEE shadow rays are traced as a second wavefront.
Dead lanes ride along masked — compaction is a measured optimization, not a
correctness requirement (reference's tasks_sort ⇒ future sorted-batch pass).

Everything here is shape-static and jit-compiled once per
(resolution, max_depth) configuration.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import math3
from ..ops.bsdf import lambert_eval, lambert_sample
from ..ops.camera import DeviceCamera, generate_camera_rays
from ..ops.intersect import MISS_DIST
from ..ops.random import RandomTarget, random_2d
from ..ops.sky import SUN_ANGULAR_RADIUS, sky_radiance, sun_solid_angle_radiance
from ..ops.traverse import trace_closest, trace_occluded
from .device_scene import (
    LEAF_SIZE,
    MAT_FLAG_EMISSIVE,
    DeviceScene,
)


class RenderConfig(NamedTuple):
    """Static compile-time configuration (part of the jit cache key)."""

    width: int
    height: int
    max_depth: int
    chunk: int | None = 65536
    shading_mode: int = 0  # ShadingMode enum


class GBufferMeta(NamedTuple):
    """Primary-hit metadata for interactive picking (reference:
    optix_kernel_raytrace.cu gbuffer-meta write, device.c:1661-1699)."""

    depth: jnp.ndarray  # f32 [N]
    instance_id: jnp.ndarray  # i32 [N]
    material_id: jnp.ndarray  # i32 [N]
    rel_hit_pos: jnp.ndarray  # f32 [N,3]


_RAY_EPS = 1e-3


def _shading_normal(geo, slot, direction, u, v):
    """Interpolated, forward-facing shading normal + geometric normal."""
    n = geo.normals[slot]  # [N,3,3]
    w = (1.0 - u - v)[..., None]
    ns = math3.normalize(
        n[:, 0] * w + n[:, 1] * u[..., None] + n[:, 2] * v[..., None]
    )
    ng = geo.face_normal[slot]
    # Face-forward both against the incoming ray.
    flip = jnp.sign(-math3.dot(ng, direction))[..., None]
    ng = ng * jnp.where(flip == 0.0, 1.0, flip)
    ns = ns * jnp.sign(math3.dot(ns, ng))[..., None]
    return ns, ng


def _sample_sun_direction(sun_dir, pixel_id, sample_id, depth):
    """Uniform direction in the solar cone."""
    r2 = random_2d(RandomTarget.LIGHT_SUN, pixel_id, sample_id, depth)
    cos_max = jnp.cos(SUN_ANGULAR_RADIUS)
    cos_t = 1.0 - r2[..., 0] * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * r2[..., 1]
    t, b = math3.orthonormal_basis(sun_dir)
    return math3.normalize(
        t * (jnp.cos(phi) * sin_t)[..., None]
        + b * (jnp.sin(phi) * sin_t)[..., None]
        + sun_dir * cos_t[..., None]
    )


def render_sample(
    scene: DeviceScene,
    cam: DeviceCamera,
    config: RenderConfig,
    pixel_x: jnp.ndarray,
    pixel_y: jnp.ndarray,
    sample_id: jnp.ndarray,
):
    """Trace one full sample for the pixel wavefront.

    Returns (radiance [N,3], gbuffer GBufferMeta, rays_traced scalar) — the
    caller accumulates. rays_traced counts closest-hit rays for live lanes
    plus NEE shadow rays (the benchmark's Mrays metric).
    """
    geo = scene.geo
    mats = scene.materials
    n = pixel_x.shape[0]
    pixel_id = pixel_y.astype(jnp.uint32) * jnp.uint32(config.width) + pixel_x.astype(
        jnp.uint32
    )

    origin, direction = generate_camera_rays(
        cam, config.width, config.height, pixel_x, pixel_y, pixel_id, sample_id
    )

    radiance = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    active = jnp.ones((n,), bool)
    rays_traced = jnp.float32(0.0)

    gbuffer = GBufferMeta(
        depth=jnp.full((n,), MISS_DIST, jnp.float32),
        instance_id=jnp.full((n,), -1, jnp.int32),
        material_id=jnp.full((n,), -1, jnp.int32),
        rel_hit_pos=jnp.zeros((n, 3), jnp.float32),
    )

    sun_radiance = sun_solid_angle_radiance(scene.sky)

    # Static python depth loop (unrolled into the jitted graph, like the
    # reference's per-depth kernel queue which is also depth-unrolled on the
    # action list level, device_renderer.c:59-131).
    for depth in range(config.max_depth):
        rays_traced = rays_traced + jnp.sum(active.astype(jnp.float32))
        hit = trace_closest(
            geo.bvh, origin, direction, leaf_size=LEAF_SIZE, chunk=config.chunk
        )
        missed = active & ~hit.valid
        hit_lane = active & hit.valid

        # Sky on miss. The solar disc only contributes on camera rays —
        # secondary sun light arrives via NEE (MIS integration pending).
        sky_rgb = sky_radiance(scene.sky, direction, include_sun=(depth == 0))
        radiance = radiance + jnp.where(
            missed[..., None], throughput * sky_rgb, 0.0
        )
        active = hit_lane

        slot = jnp.where(hit_lane, hit.slot, 0)
        mat_id = geo.material_id[slot]
        hit_pos = origin + direction * hit.t[..., None]
        ns, ng = _shading_normal(geo, slot, direction, hit.u, hit.v)

        if depth == 0:
            gbuffer = GBufferMeta(
                depth=jnp.where(hit_lane, hit.t, MISS_DIST),
                instance_id=jnp.where(hit_lane, geo.instance_id[slot], -1),
                material_id=jnp.where(hit_lane, mat_id, -1),
                rel_hit_pos=jnp.where(hit_lane[..., None], hit_pos - cam.pos, 0.0),
            )
            if config.shading_mode != 0:
                return (
                    _debug_shade(
                        config, scene, hit, hit_lane, slot, mat_id, ns, direction
                    ),
                    gbuffer,
                    rays_traced,
                )

        albedo = mats.albedo[mat_id][..., :3]
        emission = mats.emission[mat_id]
        emissive = (mats.flags[mat_id] & MAT_FLAG_EMISSIVE) != 0

        # Emission splat on hit (BSDF-sampled path; light-tree NEE + MIS
        # replace this for many-light scenes in a later stage).
        radiance = radiance + jnp.where(
            (hit_lane & emissive)[..., None], throughput * emission, 0.0
        )

        # --- NEE: one sun shadow ray per lane ---
        shadow_origin = hit_pos + ng * _RAY_EPS
        sun_sample_dir = _sample_sun_direction(
            scene.sky.sun_dir, pixel_id, sample_id, depth
        )
        facing = math3.dot(sun_sample_dir, ns) > 0.0
        above = scene.sky.sun_dir[1] > -0.1
        occluded = trace_occluded(
            geo.bvh,
            shadow_origin,
            sun_sample_dir,
            MISS_DIST,
            leaf_size=LEAF_SIZE,
            chunk=config.chunk,
        )
        visible = active & facing & ~occluded & above
        rays_traced = rays_traced + jnp.sum((active & facing).astype(jnp.float32))
        bsdf_weight = lambert_eval(ns, sun_sample_dir, albedo)
        # Solid angle of the sun cone: 2π(1-cos θ_sun)
        sun_omega = 2.0 * jnp.pi * (1.0 - jnp.cos(SUN_ANGULAR_RADIUS))
        radiance = radiance + jnp.where(
            visible[..., None],
            throughput * bsdf_weight * sun_radiance * sun_omega,
            0.0,
        )

        # --- bounce ---
        if depth + 1 < config.max_depth:
            new_dir, bounce_mult = lambert_sample(
                ns, albedo, pixel_id, sample_id, depth
            )
            throughput = throughput * jnp.where(active[..., None], bounce_mult, 1.0)
            origin = shadow_origin
            direction = jnp.where(active[..., None], new_dir, direction)

            # Russian roulette past depth 2 (reference: geometry.cuh RR on
            # camera.russian_roulette_threshold).
            if depth >= 2:
                from ..ops.random import random_1d

                p_continue = jnp.clip(
                    jnp.max(throughput, axis=-1), 0.05, 1.0
                )
                r = random_1d(
                    RandomTarget.RUSSIAN_ROULETTE, pixel_id, sample_id, depth
                )
                keep = r < p_continue
                active = active & keep
                throughput = throughput / p_continue[..., None]

    return radiance, gbuffer, rays_traced


def _debug_shade(config, scene, hit, hit_lane, slot, mat_id, ns, direction):
    """Debug shading modes (reference: geometry.cuh:182-246, ShadingMode)."""
    geo = scene.geo
    mats = scene.materials
    mode = config.shading_mode
    if mode == 1:  # ALBEDO
        albedo = mats.albedo[mat_id][..., :3]
        return jnp.where(hit_lane[..., None], albedo, 0.0)
    if mode == 2:  # DEPTH
        d = jnp.where(hit_lane, hit.t, 0.0)[..., None]
        return jnp.broadcast_to(d / jnp.maximum(jnp.max(d), 1e-6), d.shape[:-1] + (3,))
    if mode == 3:  # NORMAL
        return jnp.where(hit_lane[..., None], ns * 0.5 + 0.5, 0.0)
    if mode == 4:  # IDENTIFICATION — hash instance id to a color
        iid = geo.instance_id[slot].astype(jnp.uint32)
        h = iid * jnp.uint32(2654435761)
        rgb = jnp.stack(
            [
                (h & 0xFF).astype(jnp.float32) / 255.0,
                ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0,
                ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0,
            ],
            axis=-1,
        )
        return jnp.where(hit_lane[..., None], rgb, 0.0)
    if mode == 5:  # LIGHTS — emissive surfaces highlighted
        emissive = (mats.flags[mat_id] & MAT_FLAG_EMISSIVE) != 0
        base = jnp.where(hit_lane[..., None], jnp.full((1, 3), 0.1), 0.0)
        return jnp.where((hit_lane & emissive)[..., None], 1.0, base)
    raise ValueError(f"unknown shading mode {mode}")
