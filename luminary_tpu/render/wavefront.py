"""The wavefront path-tracing integrator.

TPU translation of the reference's per-sample device loop (reference:
src/luminary/device/device_renderer.c:59-131 — the per-depth kernel queue
RAYTRACE → SORT → GEOMETRY/... shade → SHADOW → accumulate). On TPU the
persistent-thread task queues become a dense SoA wavefront of one lane per
pixel: each depth iteration traces the whole wavefront, shades all lanes
masked by liveness, and the NEE shadow rays (sun + area light, reference
direct_lighting.cuh) are traced as additional wavefronts. Dead lanes ride
along masked — compaction is a measured optimization, not a correctness
requirement (reference's tasks_sort ⇒ future sorted-batch pass).

Light transport: GGX/Lambert/dielectric materials (ops/material.py), NEE to
the sun cone and to alias-table-sampled emissive triangles, with balance-
heuristic MIS between NEE and BSDF sampling on both strategies (reference:
cuda/mis.cuh, direct_lighting.cuh:21-119).

Everything here is shape-static and jit-compiled once per
(resolution, max_depth) configuration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import math3
from ..ops.camera import DeviceCamera, generate_camera_rays
from ..ops.intersect import MISS_DIST
from ..ops.lights import light_pdf_solid_angle, mis_balance, sample_light_point
from ..ops.material import LaneMaterial, material_eval, material_sample
from ..ops.random import RandomTarget, random_1d
from ..ops.sky import (
    SUN_ANGULAR_RADIUS,
    SUN_COS_RADIUS,
    sky_radiance,
    sun_solid_angle_radiance,
)
from ..ops.traverse import trace_closest, trace_occluded
from ..ops.volume import (
    fog_transmittance,
    hg_phase,
    sample_fog_collision,
    sample_hg_direction,
    water_transmittance,
)
from ..ops.textures import sample_atlas
from ..ops.wavefront_utils import sample_sun_direction
from .device_scene import (
    LEAF_SIZE,
    MAT_FLAG_EMISSIVE,
    MAT_FLAG_TRANSLUCENT,
    DeviceScene,
)


class RenderConfig(NamedTuple):
    """Static compile-time configuration (part of the jit cache key)."""

    width: int
    height: int
    max_depth: int
    chunk: int | None = 65536
    shading_mode: int = 0  # ShadingMode enum
    use_textures: bool = False  # static: skips atlas fetches when False
    use_clouds: bool = False  # static: skips the cloud march when False
    cloud_steps: int = 32


class GBufferMeta(NamedTuple):
    """Primary-hit metadata for interactive picking (reference:
    optix_kernel_raytrace.cu gbuffer-meta write, device.c:1661-1699)."""

    depth: jnp.ndarray  # f32 [N]
    instance_id: jnp.ndarray  # i32 [N]
    material_id: jnp.ndarray  # i32 [N]
    rel_hit_pos: jnp.ndarray  # f32 [N,3]


_RAY_EPS = 1e-3
SUN_SOLID_ANGLE = 2.0 * jnp.pi * (1.0 - jnp.cos(SUN_ANGULAR_RADIUS))


def _shading_normal(geo, slot, direction, u, v):
    """Interpolated shading normal (forward-facing) + geometric normal (both
    flipped toward the incoming ray) + the unflipped face normal."""
    n = geo.normals[slot]  # [N,3,3]
    w = (1.0 - u - v)[..., None]
    ns = math3.normalize(
        n[:, 0] * w + n[:, 1] * u[..., None] + n[:, 2] * v[..., None]
    )
    ng_raw = geo.face_normal[slot]
    flip = jnp.sign(-math3.dot(ng_raw, direction))[..., None]
    ng = ng_raw * jnp.where(flip == 0.0, 1.0, flip)
    ns = ns * jnp.sign(math3.dot(ns, ng))[..., None]
    return ns, ng, ng_raw


def _gather_material(mats, mat_id) -> LaneMaterial:
    albedo4 = mats.albedo[mat_id]
    return LaneMaterial(
        albedo=albedo4[..., :3],
        roughness=mats.roughness[mat_id],
        metallic=mats.metallic[mat_id],
        ior=mats.ior[mat_id],
        translucent=(mats.flags[mat_id] & MAT_FLAG_TRANSLUCENT) != 0,
        opacity=albedo4[..., 3],
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

    Returns (radiance [N,3], gbuffer GBufferMeta, rays_traced scalar).
    """
    geo = scene.geo
    mats = scene.materials
    lights = scene.lights
    fog = scene.fog
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
    prev_pdf = jnp.zeros((n,), jnp.float32)  # BSDF pdf of previous bounce
    prev_delta = jnp.ones((n,), bool)  # camera/delta: emission gets full weight
    # deferred sky: each lane misses at most once
    miss_dir = jnp.zeros((n, 3), jnp.float32)
    miss_throughput = jnp.zeros((n, 3), jnp.float32)
    miss_sun_weight = jnp.zeros((n,), jnp.float32)
    ever_missed = jnp.zeros((n,), bool)

    gbuffer = GBufferMeta(
        depth=jnp.full((n,), MISS_DIST, jnp.float32),
        instance_id=jnp.full((n,), -1, jnp.int32),
        material_id=jnp.full((n,), -1, jnp.int32),
        rel_hit_pos=jnp.zeros((n, 3), jnp.float32),
    )

    sun_radiance = sun_solid_angle_radiance(scene.sky)

    # Static python depth loop (the reference's action list is likewise
    # depth-unrolled, device_renderer.c:59-131).
    for depth in range(config.max_depth):
        rays_traced = rays_traced + jnp.sum(active.astype(jnp.float32))
        hit = trace_closest(
            geo.bvh, origin, direction, leaf_size=LEAF_SIZE, chunk=config.chunk
        )

        # ---- volume collision sampling (analog tracking; reference
        # VOLUME_EVENTS kernel, cuda/volume.cuh) ----
        t_media = jnp.where(hit.valid, hit.t, 1e7)
        collided, t_col = sample_fog_collision(
            fog, origin, direction, t_media, pixel_id, sample_id, depth
        )
        vol_lane = active & collided
        missed = active & ~hit.valid & ~collided
        hit_lane = active & hit.valid & ~collided

        # ---- Jerlov water absorption along the segment (exact exponential;
        # reference: ocean water medium, cuda/volume.cuh) ----
        seg_len = jnp.where(collided, t_col, jnp.where(hit.valid, hit.t, 1e7))
        throughput = throughput * water_transmittance(
            scene.water, origin, direction, seg_len
        )

        # ---- record the miss (sky evaluated ONCE after the loop: each lane
        # escapes at most once, and the SH evaluation is one of the most
        # expensive per-lane ops — ~2.4 ms per 262k-lane call measured) ----
        w_sun = jnp.where(
            prev_delta, 1.0, mis_balance(prev_pdf, 1.0 / SUN_SOLID_ANGLE)
        )
        miss_dir = jnp.where(missed[..., None], direction, miss_dir)
        miss_throughput = jnp.where(missed[..., None], throughput, miss_throughput)
        miss_sun_weight = jnp.where(missed, w_sun, miss_sun_weight)
        ever_missed = ever_missed | missed
        active = hit_lane | vol_lane

        # ---- hit context ----
        slot = jnp.where(hit_lane, hit.slot, 0)
        mat_id = geo.material_id[slot]
        t_safe = jnp.where(hit_lane, hit.t, 1.0)  # keep dead lanes finite
        hit_pos = origin + direction * t_safe[..., None]
        vol_pos = origin + direction * t_col[..., None]
        ns, ng, ng_raw = _shading_normal(geo, slot, direction, hit.u, hit.v)
        lane_mat = _gather_material(mats, mat_id)
        # albedo texture modulation (reference: 5 texture slots; albedo first)
        if config.use_textures:
            tex_id = mats.albedo_tex[mat_id]
            uvs = geo.uvs[slot]  # [N, 3, 2]
            w_b = (1.0 - hit.u - hit.v)
            uv = (
                uvs[:, 0] * w_b[..., None]
                + uvs[:, 1] * hit.u[..., None]
                + uvs[:, 2] * hit.v[..., None]
            )
            texel = sample_atlas(scene.textures, tex_id, uv[..., 0], uv[..., 1])
            lane_mat = lane_mat._replace(
                albedo=lane_mat.albedo * texel[..., :3],
                opacity=lane_mat.opacity * texel[..., 3],
            )
        wo = -direction

        # scatter-albedo loss at a volume collision
        throughput = throughput * jnp.where(
            vol_lane[..., None], fog.scatter_albedo, 1.0
        )

        if depth == 0:
            gbuffer = GBufferMeta(
                depth=jnp.where(hit_lane, hit.t, MISS_DIST),
                instance_id=jnp.where(hit_lane, geo.instance_id[slot], -1),
                material_id=jnp.where(hit_lane, mat_id, -1),
                rel_hit_pos=jnp.where(hit_lane[..., None], hit_pos - cam.pos, 0.0),
            )
            if config.shading_mode != 0:
                return (
                    _debug_shade(config, scene, hit, hit_lane, slot, mat_id, ns),
                    gbuffer,
                    rays_traced,
                )

        # ---- emission on hit (one-sided), MIS vs light NEE ----
        emission = mats.emission[mat_id]
        emissive = (mats.flags[mat_id] & MAT_FLAG_EMISSIVE) != 0
        front_face = math3.dot(ng_raw, direction) < 0.0
        cos_light = jnp.abs(math3.dot(ng_raw, direction))
        pdf_nee = light_pdf_solid_angle(lights, slot, hit.t, cos_light)
        w_emit = jnp.where(prev_delta, 1.0, mis_balance(prev_pdf, pdf_nee))
        radiance = radiance + jnp.where(
            (hit_lane & emissive & front_face)[..., None],
            throughput * emission * w_emit[..., None],
            0.0,
        )

        shadow_origin = jnp.where(
            vol_lane[..., None], vol_pos, hit_pos + ng * _RAY_EPS
        )
        nee_lane = (hit_lane & ~lane_mat.translucent) | vol_lane

        # ---- NEE strategy 1: the sun (reference direct_lighting sun RIS) ----
        sun_dir_s = sample_sun_direction(scene.sky.sun_dir, pixel_id, sample_id, depth)
        f_sun, pdf_b_sun = material_eval(lane_mat, ns, wo, sun_dir_s)
        phase_sun = hg_phase(math3.dot(direction, sun_dir_s), fog.g)
        f_sun = jnp.where(vol_lane[..., None], phase_sun[..., None], f_sun)
        pdf_b_sun = jnp.where(vol_lane, phase_sun, pdf_b_sun)
        pdf_sun = 1.0 / SUN_SOLID_ANGLE
        sun_candidate = (
            nee_lane
            & (vol_lane | (math3.dot(sun_dir_s, ns) > 0.0))
            & (scene.sky.sun_dir[1] > -0.1)
            & (scene.sky.mode != 2)
        )
        rays_traced = rays_traced + jnp.sum(sun_candidate.astype(jnp.float32))
        sun_occluded = trace_occluded(
            geo.bvh, shadow_origin, sun_dir_s, MISS_DIST,
            leaf_size=LEAF_SIZE, chunk=config.chunk,
        )
        t_fog_sun = fog_transmittance(fog, shadow_origin, sun_dir_s, 1e7)
        t_water_sun = water_transmittance(scene.water, shadow_origin, sun_dir_s, 1e7)
        w_mis_sun = mis_balance(pdf_sun, pdf_b_sun)
        radiance = radiance + jnp.where(
            (sun_candidate & ~sun_occluded)[..., None],
            throughput * f_sun * sun_radiance * t_water_sun
            * (SUN_SOLID_ANGLE * w_mis_sun * t_fog_sun)[..., None],
            0.0,
        )

        # ---- NEE strategy 2: emissive triangles (alias table) ----
        l_slot, l_point, l_n, pdf_area, l_valid = sample_light_point(
            lights, geo, shadow_origin, pixel_id, sample_id, depth
        )
        to_light = l_point - shadow_origin
        dist = math3.length(to_light)
        l_dir = jnp.where(
            (dist > 1e-6)[..., None],
            to_light * jnp.reciprocal(jnp.maximum(dist, 1e-8))[..., None],
            jnp.asarray([0.0, 0.0, 1.0]),
        )
        cos_l = math3.dot(l_n, -l_dir)  # one-sided emitter
        l_emission = mats.emission[geo.material_id[l_slot]]
        pdf_l_sa = pdf_area * dist * dist / jnp.maximum(cos_l, 1e-8)
        f_l, pdf_b_l = material_eval(lane_mat, ns, wo, l_dir)
        phase_l = hg_phase(math3.dot(direction, l_dir), fog.g)
        f_l = jnp.where(vol_lane[..., None], phase_l[..., None], f_l)
        pdf_b_l = jnp.where(vol_lane, phase_l, pdf_b_l)
        light_candidate = (
            nee_lane
            & l_valid
            & (cos_l > 1e-6)
            & (vol_lane | (math3.dot(l_dir, ns) > 0.0))
            & (dist > 1e-5)
        )
        rays_traced = rays_traced + jnp.sum(light_candidate.astype(jnp.float32))
        l_occluded = trace_occluded(
            geo.bvh, shadow_origin, l_dir, dist - 2.0 * _RAY_EPS,
            leaf_size=LEAF_SIZE, chunk=config.chunk,
        )
        t_fog_l = fog_transmittance(fog, shadow_origin, l_dir, dist)
        t_water_l = water_transmittance(scene.water, shadow_origin, l_dir, dist)
        w_mis_l = mis_balance(pdf_l_sa, pdf_b_l)
        radiance = radiance + jnp.where(
            (light_candidate & ~l_occluded)[..., None],
            throughput
            * f_l
            * l_emission
            * t_water_l
            * (w_mis_l * t_fog_l / jnp.maximum(pdf_l_sa, 1e-12))[..., None],
            0.0,
        )

        # ---- bounce ----
        if depth + 1 < config.max_depth:
            wi, weight, pdf, is_delta, transmitted = material_sample(
                lane_mat, ns, ng, wo, pixel_id, sample_id, depth
            )
            # volume lanes bounce by HG phase sampling (pdf == phase → the
            # phase/pdf ratio is 1, so weight is unity)
            wi_vol = sample_hg_direction(direction, fog.g, pixel_id, sample_id, depth)
            pdf_vol = hg_phase(math3.dot(direction, wi_vol), fog.g)
            wi = jnp.where(vol_lane[..., None], wi_vol, wi)
            weight = jnp.where(vol_lane[..., None], 1.0, weight)
            pdf = jnp.where(vol_lane, pdf_vol, pdf)
            is_delta = jnp.where(vol_lane, False, is_delta)
            throughput = throughput * jnp.where(active[..., None], weight, 1.0)
            offset_n = jnp.where(transmitted[..., None], -ng, ng)
            origin = jnp.where(
                vol_lane[..., None], vol_pos, hit_pos + offset_n * _RAY_EPS
            )
            direction = jnp.where(active[..., None], wi, direction)
            prev_pdf = jnp.where(active, pdf, 0.0)
            prev_delta = jnp.where(active, is_delta, prev_delta)

            # kill lanes with dead throughput
            active = active & (jnp.max(jnp.abs(weight), axis=-1) > 0.0)

            # Russian roulette past depth 2 (reference: geometry.cuh RR).
            if depth >= 2:
                p_continue = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
                r = random_1d(RandomTarget.RUSSIAN_ROULETTE, pixel_id, sample_id, depth)
                active = active & (r < p_continue)
                throughput = throughput / p_continue[..., None]

    # ---- deferred sky: one SH evaluation for all recorded misses ----
    safe_dir = jnp.where(
        ever_missed[..., None], miss_dir, jnp.asarray([0.0, 1.0, 0.0])
    )
    sky_rgb = sky_radiance(scene.sky, safe_dir, include_sun=False)
    in_sun_disc = math3.dot(safe_dir, scene.sky.sun_dir) >= SUN_COS_RADIUS
    sky_total = sky_rgb + jnp.where(
        in_sun_disc[..., None], sun_radiance * miss_sun_weight[..., None], 0.0
    )
    if config.use_clouds:
        # One cloud march per sample across all miss lanes (reference marches
        # per sky task; clouds live above the scene so miss position ≈ the
        # final path origin).
        from ..ops.clouds import cloud_march

        cloud_rgb, cloud_t = cloud_march(
            scene.clouds, origin, safe_dir, scene.sky.sun_dir,
            sun_radiance, sky_rgb, steps=config.cloud_steps,
        )
        sky_total = cloud_rgb + sky_total * cloud_t[..., None]
    radiance = radiance + jnp.where(
        ever_missed[..., None], miss_throughput * sky_total, 0.0
    )

    return radiance, gbuffer, rays_traced


def _debug_shade(config, scene, hit, hit_lane, slot, mat_id, ns):
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
