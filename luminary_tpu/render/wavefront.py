"""The wavefront path-tracing integrator (component-SoA).

TPU translation of the reference's per-sample device loop (reference:
src/luminary/device/device_renderer.c:59-131 — the per-depth kernel queue
RAYTRACE → SORT → GEOMETRY/... shade → SHADOW → accumulate). On TPU the
persistent-thread task queues become a dense SoA wavefront of one lane per
pixel: each depth iteration traces the whole wavefront, shades all lanes
masked by liveness, and the NEE shadow rays (sun + area light, reference
direct_lighting.cuh) are traced as additional wavefronts.

Layout discipline: ALL per-lane state is flat [N] arrays — directions as
:class:`Vec3` component bundles, colors as (r, g, b) channel arrays. On TPU
an [N, 3] array pads its minor axis 3 → 128 lanes; the flat form measures
~7x faster (ops/vec.py).

Light transport: GGX/Lambert/dielectric materials (ops/material.py), NEE to
the sun cone and to alias-table-sampled emissive triangles, with balance-
heuristic MIS between NEE and BSDF sampling on both strategies (reference:
cuda/mis.cuh, direct_lighting.cuh:21-119); analog-tracked height fog with
volume NEE; Jerlov water absorption; one deferred SH-sky evaluation and one
optional cloud march per sample.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.camera import DeviceCamera, generate_camera_rays
from ..ops.intersect import MISS_DIST
from ..ops.lights import light_pdf_from_row, mis_balance, sample_light_point
from ..ops.material import (
    LaneMaterial,
    frame_eval,
    make_frame,
    material_sample,
)
from ..ops.random import RandomTarget, blue_base, random_1d
from ..ops.rowops import gather_packed_planar, gather_planar
from ..ops.sky import (
    SUN_ANGULAR_RADIUS,
    SUN_COS_RADIUS,
    sky_radiance,
    sun_dir_vec,
    sun_solid_angle_radiance,
)
from ..ops.textures import sample_atlas
from ..ops.traverse import trace_closest, trace_occluded, trace_transmission
from ..ops.vec import Vec3, dot, gather as vgather, normalize, vwhere
from ..ops.volume import (
    fog_transmittance,
    hg_phase,
    ocean_phase,
    sample_fog_collision,
    sample_hg_direction,
    sample_ocean_phase_direction,
    sample_water_collision,
    water_transmittance,
)
from ..ops.wavefront_utils import ray_sort_key, sample_sun_direction
from .device_scene import (
    MAT_FLAG_EMISSIVE,
    MAT_FLAG_THIN_WALLED,
    MAT_FLAG_TRANSLUCENT,
    SHA_E1XY,
    SHA_E1Z2X,
    SHA_E2YZ,
    SHA_LOD,
    SHA_TEX_AR,
    SHA_TEX_L_ABBE,
    SHA_TEX_MN,
    SHA_UV0,
    SHA_UV1,
    SHA_UV2,
    SHP_ALB_BA,
    SHP_ALB_RG,
    SHP_AREA,
    SHP_EM_B_ROUGH,
    SHP_EM_RG,
    SHP_FACE,
    SHP_FLAGS,
    SHP_IDS,
    SHP_METAL_IOR,
    SHP_N0,
    SHP_N1,
    SHP_N2,
    SHA_COLS,
    SHP_COLS,
    SHP_SEL_PDF,
    DeviceScene,
    unpack_f16_pair,
    unpack_i16_pair,
    unpack_oct_snorm16,
)


class RenderConfig(NamedTuple):
    """Static compile-time configuration (part of the jit cache key)."""

    width: int
    height: int
    max_depth: int
    chunk: int | None = 65536
    shading_mode: int = 0  # ShadingMode enum
    ris_candidates: int = 4  # K alias-drawn NEE candidates per vertex (RIS)
    # Re-sort the wavefront by (liveness, direction octant, origin morton)
    # between depths — the reference's tasks_sort (kernels.cuh:394-484)
    # re-cast for TPU: the win is traversal-packet coherence + dead-lane
    # compaction into all-dead trailing chunks. Costs one argsort + one
    # packed-row gather per depth (~1 ms per Mray, measured).
    sort_wavefront: bool = False
    use_textures: bool = False  # static: skips atlas fetches when False
    use_aux_textures: bool = False  # roughness/metallic/normal/luminance maps
    use_clouds: bool = False  # static: skips the cloud march when False
    cloud_steps: int = 32
    cloud_layers: tuple = (0,)  # static active layer indices (low/mid/top)
    # Bridge volume NEE (reference light_bridges.cuh): active when the
    # scene has fog; bridge_vertices = settings.bridge_max_num_vertices.
    use_bridges: bool = False
    bridge_vertices: int = 1
    use_physical_camera: bool = False  # static: lens-stack primary rays
    # Environment-map NEE (reference: direct_lighting ambient tasks +
    # sky_hdri.cuh): a 3rd shadow-ray class sampled from the baked env's
    # cell importance, MIS-paired with BSDF-sampled sky misses. Gated off
    # under the cloud march (clouds only affect the miss side).
    env_nee: bool = False
    # Full-path spectral rendering (reference: spectral.cuh + sky.cuh 8-λ
    # sky): hero wavelength with 3 rotations riding the channel slots,
    # resolved to sRGB at sample end (ops/spectral.py).
    spectral: bool = False
    # Aerial perspective on hit segments (reference: SKY_INSCATTERING per
    # depth, device_renderer.c:59-131): atmosphere transmittance +
    # inscatter from the baked distance-curve rows. DEFAULT skies only.
    aerial: bool = False
    # Sun RIS second candidate (BSDF-proposed; reference
    # direct_lighting.cuh:21-119). Off for constant-color skies (no sun).
    sun_ris: bool = False
    # Ocean sun caustics (reference: caustics.cuh + direct_lighting.cuh
    # :121-243): RIS connection points on the wavy interface for underwater
    # vertices; the ocean-exit disc suppression pairs with it.
    ocean_caustics: bool = False
    caustics_k: int = 8
    ocean_mat_id: int = -1  # the procedural ocean material (exit detection)
    # Analytic ocean surface (reference: cuda/ocean_utils.cuh — the
    # reference never tessellates): closest hits via Lipschitz sphere
    # trace, shadow classes via sign-change march (ops/ocean.py). Replaces
    # the tessellated grid: no re-tessellation stalls, infinite extent,
    # exact silhouettes. Ocean.tessellated opts back into the mesh.
    analytic_ocean: bool = False
    # Tiled particle field (reference: particle.cuh + the tile-wrapped
    # trace): second-BVH tier on delta paths, Jendersie-d'Eon phase
    # scattering (ops/phase.py), per-sample time → motion blur.
    use_particles: bool = False
    particle_diameter: float = 50.0  # static: folds the JE phase fits
    particle_mat_id: int = -1
    # Blue-noise sampling (reference: random.cuh random_2D_base): every
    # wired draw becomes a shared Sobol point + per-pixel blue-noise CP
    # shift (ops/random.py blue_base/_blue_sobol). Costs BN_CHANNELS flat
    # gathers per sample at task creation, nothing per draw.
    blue_noise: bool = True
    # Ocean water in-scattering (reference: volume.cuh ocean volume —
    # Jerlov scalar scattering + the molecular/particle phase mixture,
    # ocean_utils.cuh:355-433). Scatter-only analog tracking composed with
    # fog by min-event; NEE shadow segments fold σ_s into the water
    # transmittance. On whenever the ocean is active.
    water_scatter: bool = False


class GBufferMeta(NamedTuple):
    """Primary-hit metadata for interactive picking (reference:
    optix_kernel_raytrace.cu gbuffer-meta write, device.c:1661-1699)."""

    depth: jnp.ndarray  # f32 [N]
    instance_id: jnp.ndarray  # i32 [N]
    material_id: jnp.ndarray  # i32 [N]
    rel_hit_pos: jnp.ndarray  # f32 [N,3]


_RAY_EPS = 1e-3
SMALL_TABLE_SLOTS = 2048  # below this, per-field gathers beat a row fetch
SUN_SOLID_ANGLE = 2.0 * jnp.pi * (1.0 - jnp.cos(SUN_ANGULAR_RADIUS))


def _shading_normal(geo, slot, direction: Vec3, u, v):
    """Interpolated shading normal (forward-facing) + geometric normal (both
    flipped toward the incoming ray) + the unflipped face normal."""
    n0 = vgather(geo.n0, slot)
    n1 = vgather(geo.n1, slot)
    n2 = vgather(geo.n2, slot)
    w = 1.0 - u - v
    ns = normalize(Vec3(
        n0.x * w + n1.x * u + n2.x * v,
        n0.y * w + n1.y * u + n2.y * v,
        n0.z * w + n1.z * u + n2.z * v,
    ))
    ng_raw = vgather(geo.face_normal, slot)
    flip_in = dot(ng_raw, direction)
    s_g = jnp.where(flip_in > 0.0, -1.0, 1.0)
    ng = Vec3(ng_raw.x * s_g, ng_raw.y * s_g, ng_raw.z * s_g)
    s_n = jnp.sign(dot(ns, ng))
    s_n = jnp.where(s_n == 0.0, 1.0, s_n)
    ns = Vec3(ns.x * s_n, ns.y * s_n, ns.z * s_n)
    return ns, ng, ng_raw


def _shading_normal_packed(srow, direction: Vec3, u, v):
    """_shading_normal reading SELECTED packed shade rows [SHP_COLS, N]
    i32 (SHP_* map: oct-snorm16 corner + face normals)."""
    w = 1.0 - u - v
    n0x, n0y, n0z = unpack_oct_snorm16(srow[SHP_N0])
    n1x, n1y, n1z = unpack_oct_snorm16(srow[SHP_N1])
    n2x, n2y, n2z = unpack_oct_snorm16(srow[SHP_N2])
    ns = normalize(Vec3(
        n0x * w + n1x * u + n2x * v,
        n0y * w + n1y * u + n2y * v,
        n0z * w + n1z * u + n2z * v,
    ))
    fx, fy, fz = unpack_oct_snorm16(srow[SHP_FACE])
    ng_raw = Vec3(fx, fy, fz)
    flip_in = dot(ng_raw, direction)
    s_g = jnp.where(flip_in > 0.0, -1.0, 1.0)
    ng = Vec3(ng_raw.x * s_g, ng_raw.y * s_g, ng_raw.z * s_g)
    s_n = jnp.sign(dot(ns, ng))
    s_n = jnp.where(s_n == 0.0, 1.0, s_n)
    ns = Vec3(ns.x * s_n, ns.y * s_n, ns.z * s_n)
    return ns, ng, ng_raw


def _gather_material(mats, mat_id) -> LaneMaterial:
    flags = mats.flags[mat_id]
    return LaneMaterial(
        albedo_r=mats.albedo_r[mat_id],
        albedo_g=mats.albedo_g[mat_id],
        albedo_b=mats.albedo_b[mat_id],
        roughness=mats.roughness[mat_id],
        metallic=mats.metallic[mat_id],
        ior=mats.ior[mat_id],
        translucent=(flags & MAT_FLAG_TRANSLUCENT) != 0,
        opacity=mats.albedo_a[mat_id],
        thin_walled=(flags & MAT_FLAG_THIN_WALLED) != 0,
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
    # Per-pixel blue-noise base values: BN_CHANNELS flat gathers, ONCE per
    # sample; every wired draw then shifts a shared Sobol point by its
    # statically-assigned channel (reference: random.cuh random_2D_base).
    bn = blue_base(pixel_x, pixel_y) if config.blue_noise else None

    if config.use_physical_camera and cam.phys is not None:
        from ..ops.camera_physical import generate_physical_camera_rays

        origin, direction, (cw_r, cw_g, cw_b) = generate_physical_camera_rays(
            cam, cam.phys, config.width, config.height,
            pixel_x, pixel_y, pixel_id, sample_id,
        )
    else:
        origin, direction = generate_camera_rays(
            cam, config.width, config.height, pixel_x, pixel_y, pixel_id,
            sample_id, bn=bn,
        )
        cw_r = cw_g = cw_b = None

    zeros = jnp.zeros((n,), jnp.float32)
    ones = jnp.ones((n,), jnp.float32)
    rad_r, rad_g, rad_b = zeros, zeros, zeros
    thr_r, thr_g, thr_b = ones, ones, ones
    if cw_r is not None:  # lens-stack throughput (vignetting + spectral)
        thr_r, thr_g, thr_b = cw_r, cw_g, cw_b
    active = jnp.ones((n,), bool)
    rays_traced = jnp.float32(0.0)
    prev_pdf = zeros  # BSDF pdf of previous bounce
    prev_delta = jnp.ones((n,), bool)  # camera/delta: emission gets full weight
    # wavefront sort bookkeeping: lanes may be permuted between depths;
    # orig_lane unscrambles the radiance at the end (one row scatter)
    orig_lane = jnp.arange(n, dtype=jnp.int32)
    sample_id = jnp.broadcast_to(jnp.asarray(sample_id, jnp.uint32), (n,))
    # medium stack: 2-deep per-lane IOR stack (reference medium_stack.cuh);
    # 0 = camera in vacuum/air
    medium = jnp.zeros((n,), jnp.uint32)
    # deferred sky: each lane misses at most once
    miss_dir = Vec3(zeros, zeros, zeros)
    miss_thr_r, miss_thr_g, miss_thr_b = zeros, zeros, zeros
    miss_sun_weight = zeros
    # bounce pdf recorded at the miss for env-NEE MIS (-1 = full weight);
    # resolved to a weight once after the loop (see the deferred-sky tail)
    miss_env_weight = -ones
    ever_missed = jnp.zeros((n,), bool)
    # MIS coverage flags of the PREVIOUS vertex: a bounce keeps full weight
    # for any light class its origin vertex could not NEE-sample (no
    # strategy ran, or the bounce transmitted below the sampled hemisphere)
    prev_sun_nee = jnp.zeros((n,), bool)
    prev_sun2 = jnp.zeros((n,), bool)
    prev_light_nee = jnp.zeros((n,), bool)
    prev_env_nee = jnp.zeros((n,), bool)
    # bounce refracted UP through the ocean surface: its sun-disc hit is
    # owned by the caustic strategy (render double-count suppression)
    ocean_exit = jnp.zeros((n,), bool)
    # Reference bridges semantics (light_common.cuh:11-13, volume.cuh:262,
    # direct_lighting.cuh:253/299): once a path phase-scatters in a volume,
    # the bridge set at that FIRST vertex exclusively owns all geometry-
    # light transport (orders 1..M); later vertices run no geometry NEE and
    # collect no geometry emission, so the forward phase chain cannot
    # double-count the same orders. Only materialized for M>=2 — M=1 keeps
    # the exact direct/emission MIS pairing, which has no order overlap.
    multi_bridge = config.use_bridges and config.bridge_vertices >= 2
    vol_scattered = jnp.zeros((n,), bool) if multi_bridge else None

    gbuffer = GBufferMeta(
        depth=jnp.full((n,), MISS_DIST, jnp.float32),
        instance_id=jnp.full((n,), -1, jnp.int32),
        material_id=jnp.full((n,), -1, jnp.int32),
        rel_hit_pos=jnp.zeros((n, 3), jnp.float32),
    )

    sun_radiance = sun_solid_angle_radiance(scene.sky)  # f32 [3]
    sun_v = sun_dir_vec(scene.sky)

    # ---- spectral mode (reference: spectral.cuh CIE sampling): the three
    # channel slots carry hero wavelengths; every RGB quantity entering the
    # transport is uplifted to its slot's wavelength via spec3(), and the
    # sample resolves to sRGB at the very end (ops/spectral.py). ----
    if config.spectral:
        from ..ops.spectral import sample_hero_wavelengths, uplift
        from ..ops.sky import sun_radiance_spectral

        u_lam = random_1d(RandomTarget.WAVELENGTH, pixel_id, sample_id, 0,
                          bn=bn)
        lam3, lam_pdf3 = sample_hero_wavelengths(u_lam)

        def spec3(r, g, b):
            return (uplift(r, g, b, lam3[0]), uplift(r, g, b, lam3[1]),
                    uplift(r, g, b, lam3[2]))

        sun_rad3 = sun_radiance_spectral(scene.sky, lam3)
        collapsed = jnp.zeros((n,), bool)  # hero-collapse after dispersion
    else:
        lam3 = lam_pdf3 = None
        collapsed = None

        def spec3(r, g, b):
            return (r, g, b)

        sun_rad3 = (sun_radiance[0], sun_radiance[1], sun_radiance[2])

    # Static python depth loop (the reference's action list is likewise
    # depth-unrolled, device_renderer.c:59-131).
    for depth in range(config.max_depth):
        rays_traced = rays_traced + jnp.sum(active.astype(jnp.float32))
        hit = trace_closest(
            geo.bvh, origin, direction, chunk=config.chunk, active=active
        )

        # ---- analytic ocean tier: march the heightfield up to the BVH hit
        # and take the nearer surface (reference: ocean_utils.cuh solver
        # running beside the OptiX trace) ----
        if config.analytic_ocean:
            from ..ops.ocean import ocean_intersect
            from ..ops.traverse import Hit as _Hit

            oc_found, oc_t = ocean_intersect(
                scene.water, origin, direction,
                jnp.where(hit.valid, hit.t, 1e7), active,
            )
            ocean_lane = oc_found
            hit = _Hit(
                t=jnp.where(oc_found, oc_t, hit.t),
                slot=jnp.where(oc_found, 0, hit.slot),
                u=jnp.where(oc_found, 0.0, hit.u),
                v=jnp.where(oc_found, 0.0, hit.v),
            )
        else:
            ocean_lane = None

        # ---- tiled particle tier: wrap lane origins (+ per-sample motion
        # offset → motion blur) into the particle tile and trace the small
        # quad BVH; delta paths only, like the reference
        # (optix_kernel_raytrace.cu:96-117) ----
        if config.use_particles:
            from ..ops.traverse import Hit as _PHit

            pt = scene.particles
            p_gate = active if depth == 0 else (active & prev_delta)
            # one consistent time per sample (reference
            # RANDOM_TARGET_CAMERA_TIME); the depth index max_depth never
            # collides with the per-depth PARTICLE_PHASE draws below
            t_cam = random_1d(
                RandomTarget.PARTICLE_PHASE, pixel_id, sample_id,
                config.max_depth)
            t_cur = jnp.where(hit.valid, hit.t, 1e7)
            # march up to 3 tile segments: wrap the running origin into the
            # tile, trace bounded by the tile-exit distance, hop the
            # boundary. One tile alone goes blind the moment the wrapped
            # origin sits on a face with the ray leaving through it.
            seg_o = Vec3(
                origin.x + pt.motion[0] * t_cam,
                origin.y + pt.motion[1] * t_cam,
                origin.z + pt.motion[2] * t_cam,
            )
            t_base = jnp.zeros((n,), jnp.float32)
            p_t = jnp.full((n,), 1e30, jnp.float32)
            p_found = jnp.zeros((n,), bool)
            hop_eps = 1e-4 * pt.scale
            for _seg in range(3):
                wrapped = Vec3(
                    jnp.mod(seg_o.x, pt.scale),
                    jnp.mod(seg_o.y, pt.scale),
                    jnp.mod(seg_o.z, pt.scale),
                )
                # distance to the tile exit along the ray (positive axes)
                def _exit(wc, dc):
                    tgt = jnp.where(dc > 0.0, pt.scale, 0.0)
                    dc_s = jnp.where(jnp.abs(dc) < 1e-9, 1e-9, dc)
                    return jnp.where(
                        jnp.abs(dc) < 1e-9, 1e30, (tgt - wc) / dc_s)
                t_exit = jnp.minimum(
                    _exit(wrapped.x, direction.x),
                    jnp.minimum(_exit(wrapped.y, direction.y),
                                _exit(wrapped.z, direction.z)))
                t_exit = jnp.maximum(t_exit, 0.0)
                seg_act = p_gate & ~p_found & (t_base < t_cur)
                h_s = trace_closest(
                    pt.bvh, wrapped, direction,
                    chunk=config.chunk, active=seg_act,
                )
                ok = seg_act & h_s.valid & (h_s.t <= t_exit + hop_eps)
                p_t = jnp.where(ok, t_base + h_s.t, p_t)
                p_found = p_found | ok
                adv = t_exit + hop_eps
                seg_o = Vec3(seg_o.x + direction.x * adv,
                             seg_o.y + direction.y * adv,
                             seg_o.z + direction.z * adv)
                t_base = t_base + adv
            particle_lane = p_gate & p_found & (p_t < t_cur)
            hit = _PHit(
                t=jnp.where(particle_lane, p_t, hit.t),
                slot=jnp.where(particle_lane, 0, hit.slot),
                u=jnp.where(particle_lane, 0.0, hit.u),
                v=jnp.where(particle_lane, 0.0, hit.v),
            )
            if ocean_lane is not None:
                ocean_lane = ocean_lane & ~particle_lane
        else:
            particle_lane = None

        # ---- volume collision sampling (analog tracking; reference
        # VOLUME_EVENTS kernel, cuda/volume.cuh) ----
        t_media = jnp.where(hit.valid, hit.t, 1e7)
        collided, t_col = sample_fog_collision(
            fog, origin, direction, t_media, pixel_id, sample_id, depth
        )
        if config.water_scatter:
            # min-event composition with the water medium: the nearer of two
            # independent exponential collisions IS a sample of the summed
            # rate where the media overlap, so this stays unbiased even if
            # the fog slab dips below the waterline.
            coll_w, t_col_w = sample_water_collision(
                scene.water, origin, direction, t_media,
                pixel_id, sample_id, depth, bn=bn)
            water_wins = coll_w & (~collided | (t_col_w < t_col))
            t_col = jnp.where(water_wins, t_col_w, t_col)
            collided = collided | coll_w
            vol_water = active & water_wins
        else:
            vol_water = None
        vol_lane = active & collided

        def vol_phase(cos_t):
            """Per-lane volume phase: the ocean's molecular/particle mixture
            on water-scatter lanes, the fog HG elsewhere."""
            p = hg_phase(cos_t, fog.g)
            if config.water_scatter:
                p = jnp.where(vol_water, ocean_phase(cos_t, scene.water), p)
            return p
        missed = active & ~hit.valid & ~collided
        hit_lane = active & hit.valid & ~collided

        # ---- Jerlov water absorption along the segment ----
        seg_len = jnp.where(collided, t_col, jnp.where(hit.valid, hit.t, 1e7))
        twr, twg, twb = spec3(*water_transmittance(
            scene.water, origin, direction, seg_len))
        thr_r, thr_g, thr_b = thr_r * twr, thr_g * twg, thr_b * twb

        # ---- aerial perspective on segments that END on geometry/fog
        # (misses get the full-path inscatter from the baked env instead;
        # reference: SKY_INSCATTERING per depth) ----
        if config.aerial:
            from ..ops.sky import aerial_fetch

            ends_here = active & (hit.valid | collided)
            (atr_r, atr_g, atr_b), (ain_r, ain_g, ain_b) = aerial_fetch(
                scene.sky, direction, seg_len * 1e-3)  # world m → km
            ain_r, ain_g, ain_b = spec3(ain_r, ain_g, ain_b)
            atr_r, atr_g, atr_b = spec3(atr_r, atr_g, atr_b)
            on = ends_here.astype(jnp.float32)
            rad_r = rad_r + thr_r * ain_r * on
            rad_g = rad_g + thr_g * ain_g * on
            rad_b = rad_b + thr_b * ain_b * on
            thr_r = thr_r * jnp.where(ends_here, atr_r, 1.0)
            thr_g = thr_g * jnp.where(ends_here, atr_g, 1.0)
            thr_b = thr_b * jnp.where(ends_here, atr_b, 1.0)

        # ---- record the miss (sky evaluated ONCE after the loop) ----
        # bounce-side balance weight over {cone NEE, bsdf NEE, bounce}:
        # p_b / (p_cone + p_b * (1 + bsdf-NEE-active)); full weight when the
        # previous vertex ran no sun NEE at all
        den_sun = (1.0 / SUN_SOLID_ANGLE
                   + prev_pdf * (1.0 + prev_sun2.astype(jnp.float32)))
        w_sun = jnp.where(
            prev_delta | ~prev_sun_nee, 1.0, prev_pdf / den_sun
        )
        if config.ocean_caustics:
            w_sun = jnp.where(ocean_exit, 0.0, w_sun)
        miss_dir = vwhere(missed, direction, miss_dir)
        miss_thr_r = jnp.where(missed, thr_r, miss_thr_r)
        miss_thr_g = jnp.where(missed, thr_g, miss_thr_g)
        miss_thr_b = jnp.where(missed, thr_b, miss_thr_b)
        miss_sun_weight = jnp.where(missed, w_sun, miss_sun_weight)
        if config.env_nee:
            # MIS against the ambient strategy: record the bounce pdf at
            # the miss (-1 = full weight) and evaluate the env-NEE pdf of
            # the escape direction ONCE after the loop — each lane misses
            # at most once, so the per-depth env_pdf cell gather here was
            # 4x the work (measured ~54 ms/sample at 1080p, round 4)
            pdfb_env = jnp.where(prev_delta | ~prev_env_nee, -1.0, prev_pdf)
            miss_env_weight = jnp.where(missed, pdfb_env, miss_env_weight)
        ever_missed = ever_missed | missed
        active = hit_lane | vol_lane

        # ---- hit context. Big scenes: ONE shade-row gather per hit
        # (device_scene.py column map; per-slot gathers cost ~11 ns per index
        # EACH, so ~25 of them lose badly). Small scenes: XLA lowers
        # small-table gathers to cheap selects, so per-field fetches win. ----
        slot = jnp.where(hit_lane, hit.slot, 0)
        t_safe = jnp.where(hit_lane, hit.t, 1.0)  # keep dead lanes finite
        hit_pos = Vec3(
            origin.x + direction.x * t_safe,
            origin.y + direction.y * t_safe,
            origin.z + direction.z * t_safe,
        )
        vol_pos = Vec3(
            origin.x + direction.x * t_col,
            origin.y + direction.y * t_col,
            origin.z + direction.z * t_col,
        )
        use_rows = (
            scene.geo.material_id.shape[0] > SMALL_TABLE_SLOTS)  # static
        need_aux = (config.use_textures or config.use_aux_textures
                    or config.spectral)
        arow = None
        if use_rows:
            # ONE packed-row gather + a fused transpose+select Pallas
            # pass: 8 quantized slots share each 128-col row so the table
            # stays under the ~17 MB gather knee (device_scene.py SHP_*
            # map); the 8->1 sub-slot select happens in VREGs
            # (ops/rowops.gather_packed_planar) and consumers decode flat
            # [SHP_COLS, N] logical rows
            srow = gather_packed_planar(scene.shade_hot, slot, SHP_COLS)
            if need_aux:
                arow = gather_packed_planar(scene.shade_aux, slot, SHA_COLS)
            ids = srow[SHP_IDS]
            mat_id = ids & 0xFFFF
            instance_id = ((ids >> 16) & 0xFFFF) - 1
            mat_flags = jax.lax.bitcast_convert_type(
                srow[SHP_FLAGS], jnp.uint32
            )
            ns, ng, ng_raw = _shading_normal_packed(
                srow, direction, hit.u, hit.v)
            alb_r, alb_g = unpack_f16_pair(srow[SHP_ALB_RG])
            alb_b, alb_a = unpack_f16_pair(srow[SHP_ALB_BA])
            em_r, em_g = unpack_f16_pair(srow[SHP_EM_RG])
            em_b, rough = unpack_f16_pair(
                srow[SHP_EM_B_ROUGH])
            metal, ior = unpack_f16_pair(srow[SHP_METAL_IOR])
            lane_mat = LaneMaterial(
                albedo_r=alb_r,
                albedo_g=alb_g,
                albedo_b=alb_b,
                roughness=rough,
                metallic=metal,
                ior=ior,
                translucent=(mat_flags & MAT_FLAG_TRANSLUCENT) != 0,
                opacity=alb_a,
                thin_walled=(mat_flags & MAT_FLAG_THIN_WALLED) != 0,
            )
            nee_sel_pdf = jax.lax.bitcast_convert_type(
                srow[SHP_SEL_PDF], jnp.float32)
            nee_area = jax.lax.bitcast_convert_type(
                srow[SHP_AREA], jnp.float32)
            if need_aux:
                u0_, v0_ = unpack_f16_pair(arow[SHA_UV0])
                u1_, v1_ = unpack_f16_pair(arow[SHA_UV1])
                u2_, v2_ = unpack_f16_pair(arow[SHA_UV2])
                uvs = (Vec3(u0_, u1_, u2_), Vec3(v0_, v1_, v2_))
                tex_id, _rough_tex = unpack_i16_pair(
                    arow[SHA_TEX_AR])
            else:
                uvs = (Vec3(zeros, zeros, zeros), Vec3(zeros, zeros, zeros))
                tex_id = jnp.full_like(mat_id, -1)
        else:
            mat_id = geo.material_id[slot]
            mat_flags = mats.flags[mat_id]
            instance_id = geo.instance_id[slot]
            ns, ng, ng_raw = _shading_normal(geo, slot, direction, hit.u, hit.v)
            lane_mat = _gather_material(mats, mat_id)
            em_r = mats.emission_r[mat_id]
            em_g = mats.emission_g[mat_id]
            em_b = mats.emission_b[mat_id]
            nee_sel_pdf = lights.slot_select_pdf[slot]
            nee_area = lights.slot_area[slot]
            uvs = (vgather(geo.uv_u, slot), vgather(geo.uv_v, slot))
            tex_id = mats.albedo_tex[mat_id]
        if config.analytic_ocean:
            # ocean lanes carry a dummy slot — replace every slot-derived
            # quantity with the analytic surface + the procedural ocean
            # material row (device_scene.procedural_materials keeps the
            # parameters in one place)
            from ..ops.ocean import ocean_normal
            from ..ops.procedural import OCEAN_INSTANCE_ID

            o_n = ocean_normal(scene.water, hit_pos.x, hit_pos.z)
            o_flip = jnp.where(dot(o_n, direction) > 0.0, -1.0, 1.0)
            o_nf = Vec3(o_n.x * o_flip, o_n.y * o_flip, o_n.z * o_flip)
            omid = config.ocean_mat_id
            mat_id = jnp.where(ocean_lane, omid, mat_id)
            mat_flags = jnp.where(
                ocean_lane, jnp.uint32(MAT_FLAG_TRANSLUCENT), mat_flags)
            instance_id = jnp.where(ocean_lane, OCEAN_INSTANCE_ID, instance_id)
            ns = vwhere(ocean_lane, o_nf, ns)
            ng = vwhere(ocean_lane, o_nf, ng)
            ng_raw = vwhere(ocean_lane, o_n, ng_raw)
            lane_mat = LaneMaterial(
                albedo_r=jnp.where(ocean_lane, mats.albedo_r[omid],
                                   lane_mat.albedo_r),
                albedo_g=jnp.where(ocean_lane, mats.albedo_g[omid],
                                   lane_mat.albedo_g),
                albedo_b=jnp.where(ocean_lane, mats.albedo_b[omid],
                                   lane_mat.albedo_b),
                roughness=jnp.where(ocean_lane, mats.roughness[omid],
                                    lane_mat.roughness),
                metallic=jnp.where(ocean_lane, 0.0, lane_mat.metallic),
                ior=jnp.where(ocean_lane, scene.water.ior, lane_mat.ior),
                translucent=lane_mat.translucent | ocean_lane,
                opacity=jnp.where(ocean_lane, 1.0, lane_mat.opacity),
                thin_walled=lane_mat.thin_walled & ~ocean_lane,
            )
            em_r = jnp.where(ocean_lane, 0.0, em_r)
            em_g = jnp.where(ocean_lane, 0.0, em_g)
            em_b = jnp.where(ocean_lane, 0.0, em_b)
            tex_id = jnp.where(ocean_lane, -1, tex_id)
        if config.use_particles:
            # particle lanes scatter by phase function — the normal is
            # irrelevant; face it toward the ray so front_face/cos guards
            # stay harmless on these lanes
            p_n = Vec3(-direction.x, -direction.y, -direction.z)
            mat_id = jnp.where(particle_lane, config.particle_mat_id, mat_id)
            mat_flags = jnp.where(particle_lane, jnp.uint32(0), mat_flags)
            from ..ops.procedural import PARTICLES_INSTANCE_ID

            instance_id = jnp.where(
                particle_lane, PARTICLES_INSTANCE_ID, instance_id)
            ns = vwhere(particle_lane, p_n, ns)
            ng = vwhere(particle_lane, p_n, ng)
            ng_raw = vwhere(particle_lane, p_n, ng_raw)
            pt = scene.particles
            lane_mat = LaneMaterial(
                albedo_r=jnp.where(particle_lane, pt.albedo[0],
                                   lane_mat.albedo_r),
                albedo_g=jnp.where(particle_lane, pt.albedo[1],
                                   lane_mat.albedo_g),
                albedo_b=jnp.where(particle_lane, pt.albedo[2],
                                   lane_mat.albedo_b),
                roughness=jnp.where(particle_lane, 1.0, lane_mat.roughness),
                metallic=jnp.where(particle_lane, 0.0, lane_mat.metallic),
                ior=jnp.where(particle_lane, 1.0, lane_mat.ior),
                translucent=lane_mat.translucent & ~particle_lane,
                opacity=jnp.where(particle_lane, 1.0, lane_mat.opacity),
                thin_walled=lane_mat.thin_walled & ~particle_lane,
            )
            em_r = jnp.where(particle_lane, 0.0, em_r)
            em_g = jnp.where(particle_lane, 0.0, em_g)
            em_b = jnp.where(particle_lane, 0.0, em_b)
            tex_id = jnp.where(particle_lane, -1, tex_id)
        if config.use_textures:
            u0, v0 = uvs
            w_b = 1.0 - hit.u - hit.v
            uu = u0.x * w_b + u0.y * hit.u + u0.z * hit.v
            vv = v0.x * w_b + v0.y * hit.u + v0.z * hit.v
            # ray-footprint mip LOD: texels per pixel ≈ texel density ×
            # hit distance × per-pixel angle / view cosine (the reference
            # gets this from hardware differentials; this is the analytic
            # stand-in, cuda/mipmap.cuh role)
            cos_view = jnp.abs(dot(ng, direction))
            spread = 2.0 * cam.fov / jnp.float32(config.height)
            if use_rows:
                lod_base = jax.lax.bitcast_convert_type(
                    arow[SHA_LOD], jnp.float32)
            else:
                lod_base = jnp.zeros_like(t_safe)
            lod = lod_base + jnp.log2(
                jnp.maximum(t_safe * spread, 1e-8)
                / jnp.maximum(cos_view, 0.05)
            )
            tr_, tg_, tb_, ta_ = sample_atlas(
                scene.textures, tex_id, uu, vv, lod=lod
            )
            lane_mat = lane_mat._replace(
                albedo_r=lane_mat.albedo_r * tr_,
                albedo_g=lane_mat.albedo_g * tg_,
                albedo_b=lane_mat.albedo_b * tb_,
                opacity=lane_mat.opacity * ta_,
            )
            # roughness / metallic / luminance / normal maps (reference:
            # cuda/material.cuh texture application, wavefront.h:33-40)
            if use_rows:
                rough_tex = _rough_tex
                metal_tex, normal_tex = unpack_i16_pair(
                    arow[SHA_TEX_MN])
                lum_tex, _ = unpack_i16_pair(
                    arow[SHA_TEX_L_ABBE])
            else:
                rough_tex = mats.roughness_tex[mat_id]
                metal_tex = mats.metallic_tex[mat_id]
                normal_tex = mats.normal_tex[mat_id]
                lum_tex = mats.luminance_tex[mat_id]
            if config.analytic_ocean:
                # dummy-slot rows: the ocean surface is untextured
                rough_tex = jnp.where(ocean_lane, -1, rough_tex)
                metal_tex = jnp.where(ocean_lane, -1, metal_tex)
                normal_tex = jnp.where(ocean_lane, -1, normal_tex)
                lum_tex = jnp.where(ocean_lane, -1, lum_tex)
            if config.use_particles:
                rough_tex = jnp.where(particle_lane, -1, rough_tex)
                metal_tex = jnp.where(particle_lane, -1, metal_tex)
                normal_tex = jnp.where(particle_lane, -1, normal_tex)
                lum_tex = jnp.where(particle_lane, -1, lum_tex)
            if config.use_aux_textures:
                rr_, _, _, _ = sample_atlas(
                    scene.textures, rough_tex, uu, vv, lod=lod,
                    trilinear=False)
                mm_, _, _, _ = sample_atlas(
                    scene.textures, metal_tex, uu, vv, lod=lod,
                    trilinear=False)
                lane_mat = lane_mat._replace(
                    roughness=jnp.where(rough_tex >= 0, rr_,
                                        lane_mat.roughness),
                    metallic=jnp.where(metal_tex >= 0, mm_,
                                       lane_mat.metallic),
                )
                lr_, lg_, lb_, _ = sample_atlas(
                    scene.textures, lum_tex, uu, vv, lod=lod,
                    trilinear=False)
                em_r = jnp.where(lum_tex >= 0, em_r * lr_, em_r)
                em_g = jnp.where(lum_tex >= 0, em_g * lg_, em_g)
                em_b = jnp.where(lum_tex >= 0, em_b * lb_, em_b)
                # tangent-space normal map perturbs the shading normal
                nx_, ny_, nz_, _ = sample_atlas(
                    scene.textures, normal_tex, uu, vv, lod=lod,
                    trilinear=False)
                du1 = u0.y - u0.x
                dv1 = v0.y - v0.x
                du2 = u0.z - u0.x
                dv2 = v0.z - v0.x
                if use_rows:
                    e1x_, e1y_ = unpack_f16_pair(
                        arow[SHA_E1XY])
                    e1z_, e2x_ = unpack_f16_pair(
                        arow[SHA_E1Z2X])
                    e2y_, e2z_ = unpack_f16_pair(
                        arow[SHA_E2YZ])
                    e1v = Vec3(e1x_, e1y_, e1z_)
                    e2v = Vec3(e2x_, e2y_, e2z_)
                else:
                    e1v = vgather(geo.bvh.tri_e1, slot)
                    e2v = vgather(geo.bvh.tri_e2, slot)
                det = du1 * dv2 - du2 * dv1
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tang = normalize(Vec3(
                    (e1v.x * dv2 - e2v.x * dv1) * inv_det,
                    (e1v.y * dv2 - e2v.y * dv1) * inv_det,
                    (e1v.z * dv2 - e2v.z * dv1) * inv_det,
                ))
                bitan = Vec3(
                    ns.y * tang.z - ns.z * tang.y,
                    ns.z * tang.x - ns.x * tang.z,
                    ns.x * tang.y - ns.y * tang.x,
                )
                tnx = nx_ * 2.0 - 1.0
                tny = ny_ * 2.0 - 1.0
                tnz = jnp.maximum(nz_ * 2.0 - 1.0, 0.1)
                ns_mapped = normalize(Vec3(
                    tang.x * tnx + bitan.x * tny + ns.x * tnz,
                    tang.y * tnx + bitan.y * tny + ns.y * tnz,
                    tang.z * tnx + bitan.z * tny + ns.z * tnz,
                ))
                has_nm = (normal_tex >= 0) & (jnp.abs(det) > 1e-12)
                ns = vwhere(has_nm, ns_mapped, ns)
        # ---- spectral ingestion: albedo/emission → per-slot wavelengths;
        # dielectric IOR gets hero-λ Cauchy dispersion (reference: spectral
        # path material evaluation; camera_physical.cuh Abbe model) ----
        if config.spectral:
            from ..ops.spectral import cauchy_ior

            if use_rows:
                _, abbe_lane = unpack_f16_pair(
                    arow[SHA_TEX_L_ABBE])
            else:
                abbe_lane = mats.abbe[mat_id]
            if config.analytic_ocean:
                abbe_lane = jnp.where(ocean_lane, 0.0, abbe_lane)
            if config.use_particles:
                abbe_lane = jnp.where(particle_lane, 0.0, abbe_lane)
            a0, a1, a2 = spec3(lane_mat.albedo_r, lane_mat.albedo_g,
                               lane_mat.albedo_b)
            lane_mat = lane_mat._replace(
                albedo_r=a0, albedo_g=a1, albedo_b=a2,
                ior=cauchy_ior(lane_mat.ior, lam3[0], abbe_lane),
            )
            em_r, em_g, em_b = spec3(em_r, em_g, em_b)
        else:
            abbe_lane = zeros
        wo = -direction

        # ---- stochastic alpha test (reference: optix_anyhit.cuh cutout
        # transparency). A cutout surface "exists" with probability opacity;
        # pass-through lanes skip emission + NEE and continue straight on
        # (keeping prev_pdf/prev_delta so MIS still sees the LAST real
        # vertex). Unbiased; costs one hash where no cutouts exist. ----
        r_alpha = random_1d(RandomTarget.ALPHA_TEST, pixel_id, sample_id, depth,
                            bn=bn)
        pass_thru = hit_lane & (r_alpha >= lane_mat.opacity)

        # scatter-albedo loss at a volume collision (water events carry
        # weight 1: scatter-only tracking; absorption is per-segment)
        vol_alb = jnp.where(vol_lane, fog.scatter_albedo, 1.0)
        if config.water_scatter:
            vol_alb = jnp.where(vol_water, 1.0, vol_alb)
        thr_r, thr_g, thr_b = thr_r * vol_alb, thr_g * vol_alb, thr_b * vol_alb

        if depth == 0:
            gbuffer = GBufferMeta(
                depth=jnp.where(hit_lane, hit.t, MISS_DIST),
                instance_id=jnp.where(hit_lane, instance_id, -1),
                material_id=jnp.where(hit_lane, mat_id, -1),
                rel_hit_pos=jnp.where(
                    hit_lane[..., None],
                    jnp.stack(
                        [hit_pos.x - cam.pos[0], hit_pos.y - cam.pos[1],
                         hit_pos.z - cam.pos[2]], axis=-1,
                    ),
                    0.0,
                ),
            )
            if config.shading_mode != 0:
                return (
                    _debug_shade(config, scene, hit, hit_lane, slot, mat_id, ns),
                    gbuffer,
                    rays_traced,
                )

        # ---- emission on hit (one-sided), MIS vs light NEE ----
        emissive = (mat_flags & MAT_FLAG_EMISSIVE) != 0
        d_dot_ng = dot(ng_raw, direction)
        front_face = d_dot_ng < 0.0
        cos_light = jnp.abs(d_dot_ng)
        pdf_nee = light_pdf_from_row(nee_sel_pdf, nee_area, hit.t, cos_light)
        if lights.has_micro:
            # emission-texture point importance: fold the hit point's micro
            # cell weight into the NEE nominal pdf (the sampler applies the
            # identical factor — ops/lights.py; reference:
            # light_microtriangle.cuh). Invert the sqrt warp at the hit
            # barycentrics to find the cell.
            mic16 = gather_planar(scene.shade_micro, slot)  # [16, N]
            b1h, b2h = hit.u, hit.v
            r1h = jnp.clip((1.0 - b1h) * (1.0 - b1h), 0.0, 0.999999)
            r2h = jnp.clip(b2h / jnp.maximum(1.0 - b1h, 1e-6), 0.0, 0.999999)
            cellh = ((r1h * 4.0).astype(jnp.int32) * 4
                     + (r2h * 4.0).astype(jnp.int32))
            ohh = jnp.arange(16, dtype=jnp.int32)[:, None] == cellh[None, :]
            w_cell = jnp.sum(jnp.where(ohh, mic16, 0.0), axis=0)
            pdf_nee = pdf_nee * w_cell
        w_emit = jnp.where(prev_delta | ~prev_light_nee, 1.0,
                           mis_balance(prev_pdf, pdf_nee))
        add_emit = jnp.where(
            hit_lane & emissive & front_face & ~pass_thru, w_emit, 0.0
        )
        if multi_bridge:
            # emission disallowed after a volume scatter: those orders are
            # covered exclusively by the first vertex's bridges
            add_emit = jnp.where(vol_scattered, 0.0, add_emit)
        rad_r = rad_r + thr_r * em_r * add_emit
        rad_g = rad_g + thr_g * em_g * add_emit
        rad_b = rad_b + thr_b * em_b * add_emit

        shadow_origin = vwhere(
            vol_lane,
            vol_pos,
            Vec3(hit_pos.x + ng.x * _RAY_EPS, hit_pos.y + ng.y * _RAY_EPS,
                 hit_pos.z + ng.z * _RAY_EPS),
        )
        nee_lane = (hit_lane & ~lane_mat.translucent & ~pass_thru) | vol_lane

        # shared shading frame for the three lobe evaluations at this hit
        frame = make_frame(lane_mat, ns, wo)

        # ---- NEE strategy 1: the sun — RIS over {solid-angle sample,
        # BSDF-proposed sample} with per-candidate MIS weights (reference:
        # direct_lighting.cuh:21-119 sun RIS). Weights use the balance
        # heuristic over the THREE samplers of the disc — cone NEE,
        # BSDF-proposed NEE, and the BSDF bounce — so rough-specular sun
        # highlights converge from whichever side is sharper. ----
        sun_nee_on = (
            nee_lane
            & (scene.sky.sun_dir[1] > -0.1)
            & (scene.sky.mode != 2)
        )
        sun_dir_s = sample_sun_direction(sun_v, pixel_id, sample_id, depth,
                                         bn=bn)
        (fs_r, fs_g, fs_b), pdf_b_sun = frame_eval(
            lane_mat, frame, lane_mat.roughness, sun_dir_s
        )
        phase_sun = vol_phase(dot(direction, sun_dir_s))
        fs_r = jnp.where(vol_lane, phase_sun, fs_r)
        fs_g = jnp.where(vol_lane, phase_sun, fs_g)
        fs_b = jnp.where(vol_lane, phase_sun, fs_b)
        pdf_b_sun = jnp.where(vol_lane, phase_sun, pdf_b_sun)
        if config.use_particles:
            # particle lanes: Jendersie-d'Eon phase x albedo (reference
            # bsdf.cuh MATERIAL_PARTICLE); the phase IS the bounce pdf
            from ..ops.phase import je_phase

            pj = je_phase(dot(direction, sun_dir_s), config.particle_diameter)
            fs_r = jnp.where(particle_lane, lane_mat.albedo_r * pj, fs_r)
            fs_g = jnp.where(particle_lane, lane_mat.albedo_g * pj, fs_g)
            fs_b = jnp.where(particle_lane, lane_mat.albedo_b * pj, fs_b)
            pdf_b_sun = jnp.where(particle_lane, pj, pdf_b_sun)
        pdf_sun = 1.0 / SUN_SOLID_ANGLE
        cand1_ok = sun_nee_on & (vol_lane | (dot(sun_dir_s, ns) > 0.0))
        phat1 = 0.2126 * fs_r + 0.7152 * fs_g + 0.0722 * fs_b
        if config.sun_ris:
            # candidate 2: a BSDF-proposed direction (surface, non-delta
            # lanes; sub-stream +64 clears every per-depth stream)
            wi_b2, _w2_unused, pdf_s2, is_delta2, trans2 = material_sample(
                lane_mat, frame, ns, wo, pixel_id, sample_id, depth + 64,
                bn=bn,
            )
            sun2_on = (sun_nee_on & ~vol_lane & ~lane_mat.translucent
                       & ~is_delta2 & ~trans2)
            if config.use_particles:
                # phase lanes take the single cone candidate, like volumes
                sun2_on = sun2_on & ~particle_lane
            cand2_ok = (sun2_on & (dot(wi_b2, sun_v) >= SUN_COS_RADIUS)
                        & (dot(wi_b2, ns) > 0.0))
            (f2_r, f2_g, f2_b), pdf_eval2 = frame_eval(
                lane_mat, frame, lane_mat.roughness, wi_b2)
            # balance weights: denominator p_cone + p_bsdf x (NEE + bounce)
            n_b1 = 1.0 + sun2_on.astype(jnp.float32)
            phat2 = 0.2126 * f2_r + 0.7152 * f2_g + 0.0722 * f2_b
            w_s1 = jnp.where(
                cand1_ok & (phat1 > 0.0),
                phat1 / jnp.maximum(pdf_sun + pdf_b_sun * n_b1, 1e-12), 0.0)
            # m2 uses the NOMINAL (frame_eval) pdf shared with the bounce
            # side; the division is by the sampler's TRUE density (bounded-
            # VNDF, material_sample) — they differ pointwise by up to ~35%
            w_s2 = jnp.where(
                cand2_ok & (phat2 > 0.0),
                pdf_eval2 / jnp.maximum(pdf_sun + pdf_eval2 * 2.0, 1e-12)
                * phat2 / jnp.maximum(pdf_s2, 1e-12), 0.0)
            wsum_sun = w_s1 + w_s2
            r_spick = random_1d(
                RandomTarget.EMISSION_INDEX, pixel_id, sample_id, depth,
                bn=bn)
            pick2 = (r_spick * wsum_sun < w_s2) & (w_s2 > 0.0)
            sun_dir_w = vwhere(pick2, wi_b2, sun_dir_s)
            fs_r = jnp.where(pick2, f2_r, fs_r)
            fs_g = jnp.where(pick2, f2_g, fs_g)
            fs_b = jnp.where(pick2, f2_b, fs_b)
            sel_phat_sun = jnp.where(pick2, phat2, phat1)
        else:
            sun2_on = jnp.zeros((n,), bool)
            w_s1 = jnp.where(
                cand1_ok & (phat1 > 0.0),
                phat1 / jnp.maximum(pdf_sun + pdf_b_sun, 1e-12), 0.0)
            wsum_sun = w_s1
            sun_dir_w = sun_dir_s
            sel_phat_sun = phat1
        sun_candidate = sun_nee_on & (wsum_sun > 0.0)
        # unbiased contribution factor: wsum / p̂(winner) replaces the old
        # Ω·w_mis/Ω form (identical when candidate 2 is off)
        sun_ris_w = jnp.where(
            sun_candidate, wsum_sun / jnp.maximum(sel_phat_sun, 1e-20), 0.0)
        rays_traced = rays_traced + jnp.sum(sun_candidate.astype(jnp.float32))
        t_fog_sun = fog_transmittance(fog, shadow_origin, sun_dir_w, 1e7)
        if config.use_clouds:
            # cloud shadows on surfaces (reference: cloud_shadow.cuh)
            from ..ops.clouds import cloud_sun_transmittance

            t_fog_sun = t_fog_sun * cloud_sun_transmittance(
                scene.clouds, shadow_origin, sun_v,
                layers=config.cloud_layers,
            )
        tws_r, tws_g, tws_b = spec3(*water_transmittance(
            scene.water, shadow_origin, sun_dir_w, 1e7,
            with_scatter=config.water_scatter,
        ))

        # ---- NEE strategy 2: emissive triangles — RIS over K alias-drawn
        # candidates, reservoir-resampled by unshadowed target contribution
        # (reference: cuda/ris.cuh:9-16 standard reservoir, light.cuh:27-60
        # resampled candidates). The nominal MIS pdf stays the 1-candidate
        # alias pdf on BOTH strategies (any pdf function shared by the two
        # sides keeps the weights summing to 1, so this is bias-free); RIS
        # only reshapes variance. Only the reservoir WINNER traces a shadow
        # ray, so the ray budget is unchanged vs. 1-candidate NEE. ----
        k_ris = max(int(config.ris_candidates), 1)
        wsum = zeros
        sel_phat = zeros
        sel_pdf_sa = ones
        sel_le = (zeros, zeros, zeros)
        sel_dir = Vec3(zeros, zeros, ones)
        sel_dist = ones
        sel_slot = jnp.zeros((n,), jnp.int32)
        sel_b1 = zeros
        sel_b2 = zeros
        for k in range(k_ris):
            dk = depth * 8 + k  # decorrelated sub-stream per candidate
            if lights.has_tree and k == 0:
                # many-light scenes: candidate 0 comes from ONE stochastic
                # light-tree descent (distance-aware, exact pdf); the rest
                # stay alias-drawn. A descent costs ~(levels+1) full-lane
                # row gathers — measured 2.2 s/sample at 1080p for K
                # independent descents, so the tree contributes exactly one
                # mixture component and RIS blends it with the cheap ones.
                from ..ops.light_tree import sample_light_tree

                t_slot, t_pdf, t_valid = sample_light_tree(
                    lights.tree_rows, lights.tree_num_nodes,
                    lights.tree_levels, shadow_origin,
                    pixel_id, sample_id, dk, bn=bn,
                )
                cand = dict(slot=t_slot, pdf_select=t_pdf, sel_valid=t_valid)
            else:
                cand = {}
            l_slot, l_point, l_n, pdf_area, pdf_area_alias, \
                (le_r, le_g, le_b), l_valid, (l_b1, l_b2) = \
                sample_light_point(
                    lights, scene.light_slot_rows if use_rows else None,
                    pixel_id, sample_id, dk,
                    geo=geo, materials=mats, bn=bn, **cand,
                )
            to_light = l_point - shadow_origin
            dist = jnp.sqrt(jnp.maximum(dot(to_light, to_light), 0.0))
            inv_dist = jnp.reciprocal(jnp.maximum(dist, 1e-8))
            l_dir = vwhere(
                dist > 1e-6,
                Vec3(to_light.x * inv_dist, to_light.y * inv_dist,
                     to_light.z * inv_dist),
                Vec3.of(0.0, 0.0, 1.0, like=to_light),
            )
            cos_l = -dot(l_n, l_dir)  # one-sided emitter
            pdf_l_sa = pdf_area * dist * dist / jnp.maximum(cos_l, 1e-8)
            # the nominal MIS pdf: ALWAYS the alias-table pdf of the slot —
            # the same pdf function the BSDF-hit side evaluates — even when
            # the candidate itself came from a light-tree descent. RIS uses
            # the true candidate pdf in w_k below; MIS must not.
            pdf_mis_sa = (pdf_area_alias * dist * dist
                          / jnp.maximum(cos_l, 1e-8))
            cos_s = dot(l_dir, ns)
            cand_ok = (
                nee_lane
                & l_valid
                & (cos_l > 1e-6)
                & (vol_lane | (cos_s > 0.0))
                & (dist > 1e-5)
            )
            if multi_bridge:
                # no geometry NEE (direct or bridged) after a volume scatter
                cand_ok = cand_ok & ~vol_scattered
            # CHEAP geometric target: luminance x both cosines / d^2 — the
            # full BSDF is evaluated ONCE for the reservoir winner below
            # (reference light.cuh resamples with a simplified target too).
            # Any positive target keeps RIS unbiased; only variance shifts.
            lum_le = 0.2126 * le_r + 0.7152 * le_g + 0.0722 * le_b
            phat = (
                lum_le * cos_l * jnp.where(vol_lane, 1.0, jnp.maximum(cos_s, 0.0))
                * inv_dist * inv_dist
            )
            w_k = jnp.where(
                cand_ok & (pdf_l_sa > 1e-12) & (phat > 0.0),
                phat / jnp.maximum(pdf_l_sa, 1e-12),
                0.0,
            )
            wsum = wsum + w_k
            if k == 0:
                take = w_k > 0.0
            else:
                r_k = random_1d(RandomTarget.LIGHT_RIS, pixel_id, sample_id, dk,
                                bn=bn)
                take = (r_k * wsum < w_k) & (w_k > 0.0)
            sel_phat = jnp.where(take, phat, sel_phat)
            sel_pdf_sa = jnp.where(take, pdf_mis_sa, sel_pdf_sa)
            sel_le = tuple(jnp.where(take, c, s) for c, s in zip(
                (le_r, le_g, le_b), sel_le))
            sel_dir = vwhere(take, l_dir, sel_dir)
            sel_dist = jnp.where(take, dist, sel_dist)
            sel_slot = jnp.where(take, l_slot, sel_slot)
            sel_b1 = jnp.where(take, l_b1, sel_b1)
            sel_b2 = jnp.where(take, l_b2, sel_b2)
        # unbiased contribution weight W = wsum / (K * p-hat(winner))
        ris_w = jnp.where(
            sel_phat > 0.0, wsum / (k_ris * jnp.maximum(sel_phat, 1e-20)), 0.0
        )
        # full BSDF evaluation for the winner only
        (fl_r, fl_g, fl_b), pdf_b_l = frame_eval(
            lane_mat, frame, lane_mat.roughness, sel_dir
        )
        phase_l = vol_phase(dot(direction, sel_dir))
        fl_r = jnp.where(vol_lane, phase_l, fl_r)
        fl_g = jnp.where(vol_lane, phase_l, fl_g)
        fl_b = jnp.where(vol_lane, phase_l, fl_b)
        pdf_b_l = jnp.where(vol_lane, phase_l, pdf_b_l)
        if config.use_particles:
            from ..ops.phase import je_phase

            pj_l = je_phase(dot(direction, sel_dir), config.particle_diameter)
            fl_r = jnp.where(particle_lane, lane_mat.albedo_r * pj_l, fl_r)
            fl_g = jnp.where(particle_lane, lane_mat.albedo_g * pj_l, fl_g)
            fl_b = jnp.where(particle_lane, lane_mat.albedo_b * pj_l, fl_b)
            pdf_b_l = jnp.where(particle_lane, pj_l, pdf_b_l)
        sel_w_mis = mis_balance(sel_pdf_sa, pdf_b_l)
        le_r, le_g, le_b = sel_le
        l_dir, dist = sel_dir, sel_dist
        light_candidate = wsum > 0.0
        if config.use_textures and config.use_aux_textures:
            # luminance map at the sampled light point — keeps NEE's Le
            # identical to the BSDF-hit Le (estimator consistency)
            wb0 = 1.0 - sel_b1 - sel_b2
            if use_rows:
                wrow = gather_packed_planar(
                    scene.shade_aux, sel_slot, SHA_COLS)
                wlum, _ = unpack_i16_pair(wrow[SHA_TEX_L_ABBE])
                wu0, wv0 = unpack_f16_pair(wrow[SHA_UV0])
                wu1, wv1 = unpack_f16_pair(wrow[SHA_UV1])
                wu2, wv2 = unpack_f16_pair(wrow[SHA_UV2])
                wuu = wu0 * wb0 + wu1 * sel_b1 + wu2 * sel_b2
                wvv = wv0 * wb0 + wv1 * sel_b1 + wv2 * sel_b2
            else:
                wlum = mats.luminance_tex[geo.material_id[sel_slot]]
                wu3 = vgather(geo.uv_u, sel_slot)
                wv3 = vgather(geo.uv_v, sel_slot)
                wuu = wu3.x * wb0 + wu3.y * sel_b1 + wu3.z * sel_b2
                wvv = wv3.x * wb0 + wv3.y * sel_b1 + wv3.z * sel_b2
            wlr, wlg, wlb, _ = sample_atlas(scene.textures, wlum, wuu, wvv)
            le_r = jnp.where(wlum >= 0, le_r * wlr, le_r)
            le_g = jnp.where(wlum >= 0, le_g * wlg, le_g)
            le_b = jnp.where(wlum >= 0, le_b * wlb, le_b)
        rays_traced = rays_traced + jnp.sum(light_candidate.astype(jnp.float32))

        # ---- NEE strategy 3: the environment (reference: direct_lighting
        # ambient tasks + sky_hdri.cuh importance). One alias-cell draw per
        # vertex; Le is the full no-disc sky (the disc pairs with the sun
        # strategy). MIS vs BSDF sampling; the BSDF-miss side applies the
        # matching weight (miss_env_weight above). ----
        if config.env_nee:
            from ..ops.sky import sample_env_direction

            env_dir, pdf_env = sample_env_direction(
                scene.sky, pixel_id, sample_id, depth, bn=bn)
            (fe_r, fe_g, fe_b), pdf_b_env = frame_eval(
                lane_mat, frame, lane_mat.roughness, env_dir)
            phase_env = vol_phase(dot(direction, env_dir))
            fe_r = jnp.where(vol_lane, phase_env, fe_r)
            fe_g = jnp.where(vol_lane, phase_env, fe_g)
            fe_b = jnp.where(vol_lane, phase_env, fe_b)
            pdf_b_env = jnp.where(vol_lane, phase_env, pdf_b_env)
            if config.use_particles:
                from ..ops.phase import je_phase

                pj_e = je_phase(
                    dot(direction, env_dir), config.particle_diameter)
                fe_r = jnp.where(particle_lane, lane_mat.albedo_r * pj_e, fe_r)
                fe_g = jnp.where(particle_lane, lane_mat.albedo_g * pj_e, fe_g)
                fe_b = jnp.where(particle_lane, lane_mat.albedo_b * pj_e, fe_b)
                pdf_b_env = jnp.where(particle_lane, pj_e, pdf_b_env)
            env_candidate = (
                nee_lane
                & (pdf_env > 1e-12)
                & (scene.sky.env_nee_total > 0.0)
                & (vol_lane | (dot(env_dir, ns) > 0.0))
            )
            rays_traced = rays_traced + jnp.sum(
                env_candidate.astype(jnp.float32))
            if config.spectral:
                from ..ops.sky import sky_radiance_spectral

                env_le = Vec3(*sky_radiance_spectral(
                    scene.sky, env_dir, lam3))
            else:
                env_le = sky_radiance(scene.sky, env_dir, include_sun=False)
            t_fog_env = fog_transmittance(fog, shadow_origin, env_dir, 1e7)
            twe_r, twe_g, twe_b = spec3(*water_transmittance(
                scene.water, shadow_origin, env_dir, 1e7,
                with_scatter=config.water_scatter))
            w_mis_env = mis_balance(pdf_env, pdf_b_env)
        # ---- NEE strategy 4: ocean sun caustics for underwater vertices
        # (reference: caustics.cuh RIS connection points) ----
        if config.ocean_caustics:
            from ..ops.caustics import sample_caustic_connection

            uw_lane = (nee_lane & scene.water.active
                       & (shadow_origin.y < scene.water.height)
                       & sun_nee_on)
            cau_p, cau_u, cau_dist, cau_weight, cau_valid = \
                sample_caustic_connection(
                    scene.water, sun_v, shadow_origin,
                    pixel_id, sample_id, depth, config.caustics_k)
            cau_candidate = uw_lane & cau_valid
            rays_traced = rays_traced + 2.0 * jnp.sum(
                cau_candidate.astype(jnp.float32))
        # All NEE visibility queries ride ONE batched any-hit trace (one
        # lockstep walk): sun, area-light, env, and caustic rays (reference
        # fires them from one shadow kernel too, optix_kernel_shadow.cu).
        seg_o = [shadow_origin, shadow_origin]
        seg_d = [sun_dir_w, l_dir]
        seg_t = [jnp.full((n,), MISS_DIST), dist - 2.0 * _RAY_EPS]
        seg_a = [sun_candidate, light_candidate]
        if config.env_nee:
            seg_o.append(shadow_origin)
            seg_d.append(env_dir)
            seg_t.append(jnp.full((n,), MISS_DIST))
            seg_a.append(env_candidate)
        if config.ocean_caustics:
            i_cau = len(seg_o)
            # x → P (shortened: P sits ON the tessellated surface) and
            # P → sun (offset off the interface)
            seg_o.append(shadow_origin)
            seg_d.append(cau_u)
            seg_t.append(cau_dist * 0.95)
            seg_a.append(cau_candidate)
            seg_o.append(Vec3(cau_p.x + sun_v.x * 0.02,
                              cau_p.y + sun_v.y * 0.02 + 0.02,
                              cau_p.z + sun_v.z * 0.02))
            seg_d.append(Vec3(jnp.broadcast_to(sun_v.x, (n,)),
                              jnp.broadcast_to(sun_v.y, (n,)),
                              jnp.broadcast_to(sun_v.z, (n,))))
            seg_t.append(jnp.full((n,), MISS_DIST))
            seg_a.append(cau_candidate)
        k_seg = len(seg_d)

        def _cat(parts):
            return jnp.concatenate(parts)

        shadow_o = Vec3(_cat([o.x for o in seg_o]),
                        _cat([o.y for o in seg_o]),
                        _cat([o.z for o in seg_o]))
        shadow_d = Vec3(_cat([d.x for d in seg_d]),
                        _cat([d.y for d in seg_d]),
                        _cat([d.z for d in seg_d]))
        shadow_t = _cat(seg_t)
        shadow_act = _cat(seg_a)
        occ = trace_occluded(
            geo.bvh, shadow_o, shadow_d, shadow_t,
            chunk=config.chunk, active=shadow_act,
        )
        if config.analytic_ocean:
            # the analytic surface occludes every shadow class; sign-change
            # detection keeps the caustic segments (which END on the
            # interface) unblocked by their own endpoint (ops/ocean.py)
            from ..ops.ocean import ocean_crosses

            occ = occ | ocean_crosses(
                scene.water, shadow_o, shadow_d, shadow_t,
                shadow_act & ~occ,
            )
        sun_occluded, l_occluded = occ[:n], occ[n:2 * n]
        # cutout transparency along the shadow rays (alpha-aware shadows;
        # static no-op when the scene has no cutout materials)
        if geo.bvh.has_cutouts:
            trans = trace_transmission(
                geo.bvh, shadow_o, shadow_d, shadow_t,
                chunk=config.chunk, active=shadow_act & ~occ,
            )
            tr_sun, tr_l = trans[:n], trans[n:2 * n]
            tr_env = trans[2 * n:3 * n] if config.env_nee else 1.0
        else:
            tr_sun = tr_l = tr_env = 1.0
        sun_w = jnp.where(sun_candidate & ~sun_occluded,
                          sun_ris_w * t_fog_sun * tr_sun,
                          0.0)
        rad_r = rad_r + thr_r * fs_r * sun_rad3[0] * tws_r * sun_w
        rad_g = rad_g + thr_g * fs_g * sun_rad3[1] * tws_g * sun_w
        rad_b = rad_b + thr_b * fs_b * sun_rad3[2] * tws_b * sun_w
        t_fog_l = fog_transmittance(fog, shadow_origin, l_dir, dist)
        twl_r, twl_g, twl_b = spec3(*water_transmittance(
            scene.water, shadow_origin, l_dir, dist,
            with_scatter=config.water_scatter,
        ))
        # winner light emission → slot wavelengths (covers the bridge
        # estimator below too)
        le_r, le_g, le_b = spec3(le_r, le_g, le_b)
        direct_lane = light_candidate & (
            ~vol_lane if config.use_bridges else True
        )
        if config.use_bridges and config.water_scatter:
            # bridges model FOG chains; water-scatter vertices connect
            # directly (reference: bridges are fog-volume tasks only)
            direct_lane = direct_lane | (vol_water & light_candidate)
        l_w = jnp.where(
            direct_lane & ~l_occluded,
            sel_w_mis * t_fog_l * ris_w * tr_l,
            0.0,
        )
        rad_r = rad_r + thr_r * fl_r * le_r * twl_r * l_w
        rad_g = rad_g + thr_g * fl_g * le_g * twl_g * l_w
        rad_b = rad_b + thr_b * fl_b * le_b * twl_b * l_w
        if config.env_nee:
            env_occluded = occ[2 * n:3 * n]
            env_w = jnp.where(
                env_candidate & ~env_occluded,
                w_mis_env / jnp.maximum(pdf_env, 1e-12) * t_fog_env * tr_env,
                0.0,
            )
            rad_r = rad_r + thr_r * fe_r * env_le.x * twe_r * env_w
            rad_g = rad_g + thr_g * fe_g * env_le.y * twe_g * env_w
            rad_b = rad_b + thr_b * fe_b * env_le.z * twe_b * env_w
        if config.ocean_caustics:
            cau_blocked = (occ[i_cau * n:(i_cau + 1) * n]
                           | occ[(i_cau + 1) * n:(i_cau + 2) * n])
            (fc_r, fc_g, fc_b), _pdf_c = frame_eval(
                lane_mat, frame, lane_mat.roughness, cau_u)
            phase_c = vol_phase(dot(direction, cau_u))
            fc_r = jnp.where(vol_lane, phase_c, fc_r)
            fc_g = jnp.where(vol_lane, phase_c, fc_g)
            fc_b = jnp.where(vol_lane, phase_c, fc_b)
            if config.use_particles:
                from ..ops.phase import je_phase

                pj_c = je_phase(
                    dot(direction, cau_u), config.particle_diameter)
                fc_r = jnp.where(particle_lane, lane_mat.albedo_r * pj_c, fc_r)
                fc_g = jnp.where(particle_lane, lane_mat.albedo_g * pj_c, fc_g)
                fc_b = jnp.where(particle_lane, lane_mat.albedo_b * pj_c, fc_b)
            # the whole x→P segment is underwater: Jerlov absorption (+
            # scattering extinction when water in-scattering is on — this
            # is a shadow-class segment, not an analog-tracked one)
            cau_sig = (scene.water.scatter
                       if config.water_scatter else 0.0)
            twc_r, twc_g, twc_b = spec3(
                jnp.exp(-(scene.water.absorb[0] + cau_sig) * cau_dist),
                jnp.exp(-(scene.water.absorb[1] + cau_sig) * cau_dist),
                jnp.exp(-(scene.water.absorb[2] + cau_sig) * cau_dist))
            c_w = jnp.where(cau_candidate & ~cau_blocked, cau_weight, 0.0)
            rad_r = rad_r + thr_r * fc_r * sun_rad3[0] * twc_r * c_w
            rad_g = rad_g + thr_g * fc_g * sun_rad3[1] * twc_g * c_w
            rad_b = rad_b + thr_b * fc_b * sun_rad3[2] * twc_b * c_w

        # ---- bridge volume NEE: volume vertices connect to the winner
        # light through 1..bridge_vertices scattering events (reference:
        # light_bridges.cuh; see ops/bridges.py for the scaling math).
        # M=1 reproduces the direct connection exactly. ----
        if config.use_bridges:
            from ..ops.bridges import sample_bridge

            y_pt = Vec3(
                shadow_origin.x + l_dir.x * dist,
                shadow_origin.y + l_dir.y * dist,
                shadow_origin.z + l_dir.z * dist,
            )
            (b_dir, b_starts, b_dirs, b_lens, b_wpdf, b_phase, b_m) = (
                sample_bridge(
                    shadow_origin, y_pt, direction, fog.g,
                    fog.sigma_t * fog.scatter_albedo, fog.sigma_t,
                    config.bridge_vertices, pixel_id, sample_id, depth,
                )
            )
            b_lane = vol_lane & light_candidate
            if config.water_scatter:
                b_lane = b_lane & ~vol_water
            b_occ = jnp.zeros((n,), bool)
            for i in range(config.bridge_vertices):
                act_i = b_lane & (i < b_m) & ~b_occ
                rays_traced = rays_traced + jnp.sum(act_i.astype(jnp.float32))
                b_occ = b_occ | trace_occluded(
                    geo.bvh, b_starts[i], b_dirs[i],
                    jnp.maximum(b_lens[i] - 2.0 * _RAY_EPS, 0.0),
                    chunk=config.chunk, active=act_i,
                )
                if config.analytic_ocean:
                    from ..ops.ocean import ocean_crosses

                    b_occ = b_occ | ocean_crosses(
                        scene.water, b_starts[i], b_dirs[i],
                        jnp.maximum(b_lens[i] - 2.0 * _RAY_EPS, 0.0),
                        act_i & ~b_occ,
                    )
            if multi_bridge:
                # all orders are bridge-exclusive here: vol_scattered kills
                # the forward chain's geometry NEE and emitter hits, so even
                # the sampled M=1 (direct) order has no overlapping estimator
                w_mis_b = 1.0
            else:
                # M capped at 1: the bridge IS the direct connection, MIS-
                # paired with the phase-sampled emitter hit as usual
                w_mis_b = sel_w_mis
            # g per steradian = Le * phase_first * (w/pdf) * d^2 (the light
            # cosine folds into the area kernel and cancels against the
            # solid-angle Jacobian; M=1 reduces exactly to the direct form)
            bw = jnp.where(
                b_lane & ~b_occ,
                b_phase * b_wpdf * dist * dist * ris_w * w_mis_b,
                0.0,
            )
            rad_r = rad_r + thr_r * le_r * bw
            rad_g = rad_g + thr_g * le_g * bw
            rad_b = rad_b + thr_b * le_b * bw

        # ---- bounce ----
        if depth + 1 < config.max_depth:
            # medium transition for the translucent lobe: entering (front
            # face) → into this material; exiting → into the stack's next
            # medium (reference: geometry.cuh medium-stack IOR transitions)
            from ..ops.material import (
                medium_below_ior,
                medium_pop,
                medium_push,
                medium_top_ior,
            )

            cur_ior = medium_top_ior(medium)
            # thin-walled always uses its own ior for the interface Fresnel
            n_trans = jnp.where(
                front_face | lane_mat.thin_walled,
                lane_mat.ior,
                medium_below_ior(medium),
            )
            eta_rel = n_trans / jnp.maximum(cur_ior, 1e-6)
            wi, (wr, wg, wb), pdf, is_delta, transmitted = material_sample(
                lane_mat, frame, ns, wo, pixel_id, sample_id, depth,
                eta_rel=eta_rel, bn=bn,
            )
            do_trans = active & hit_lane & transmitted & ~pass_thru
            medium = jnp.where(
                do_trans,
                jnp.where(
                    front_face,
                    medium_push(medium, lane_mat.ior),
                    medium_pop(medium),
                ),
                medium,
            )
            # volume lanes bounce by HG phase sampling (pdf == phase → the
            # phase/pdf ratio is 1, so weight is unity)
            # particle lanes bounce by JE phase sampling (perfect importance
            # sampling → weight is exactly the albedo; reference bsdf.cuh
            # MATERIAL_PARTICLE). Overrides transmitted BEFORE the medium
            # update so a garbage material_sample can't push the stack.
            if config.use_particles:
                from ..ops.phase import je_phase, je_sample_direction

                r_p1 = random_1d(
                    RandomTarget.PARTICLE_PHASE, pixel_id, sample_id, depth,
                    bn=bn)
                r_p2 = random_1d(
                    RandomTarget.VOLUME_PHASE, pixel_id, sample_id, depth,
                    bn=bn)
                r_pc = random_1d(
                    RandomTarget.BSDF_CHOICE, pixel_id, sample_id, depth,
                    bn=bn)
                wi_p = je_sample_direction(
                    direction, config.particle_diameter, r_p1, r_p2, r_pc)
                wi = vwhere(particle_lane, wi_p, wi)
                wr = jnp.where(particle_lane, lane_mat.albedo_r, wr)
                wg = jnp.where(particle_lane, lane_mat.albedo_g, wg)
                wb = jnp.where(particle_lane, lane_mat.albedo_b, wb)
                pdf = jnp.where(
                    particle_lane,
                    je_phase(dot(direction, wi_p), config.particle_diameter),
                    pdf)
                is_delta = jnp.where(particle_lane, False, is_delta)
                transmitted = jnp.where(particle_lane, False, transmitted)
            wi_vol = sample_hg_direction(direction, fog.g, pixel_id, sample_id,
                                         depth, bn=bn)
            if config.water_scatter:
                wi_vol = vwhere(
                    vol_water,
                    sample_ocean_phase_direction(
                        direction, scene.water, pixel_id, sample_id, depth,
                        bn=bn),
                    wi_vol)
            pdf_vol = vol_phase(dot(direction, wi_vol))
            wi = vwhere(vol_lane, wi_vol, wi)
            wr = jnp.where(vol_lane, 1.0, wr)
            wg = jnp.where(vol_lane, 1.0, wg)
            wb = jnp.where(vol_lane, 1.0, wb)
            pdf = jnp.where(vol_lane, pdf_vol, pdf)
            is_delta = jnp.where(vol_lane, False, is_delta)
            # alpha-test pass-through: continue straight, weight 1
            wi = vwhere(pass_thru, direction, wi)
            wr = jnp.where(pass_thru, 1.0, wr)
            wg = jnp.where(pass_thru, 1.0, wg)
            wb = jnp.where(pass_thru, 1.0, wb)
            thr_r = thr_r * jnp.where(active, wr, 1.0)
            thr_g = thr_g * jnp.where(active, wg, 1.0)
            thr_b = thr_b * jnp.where(active, wb, 1.0)
            # ---- hero-wavelength collapse at dispersive refraction: the
            # non-hero slots' refracted geometry would differ, so they
            # terminate and the hero carries the full spectral estimate
            # (x3 = the dropped 1/C average; standard unbiased collapse) ----
            if config.spectral:
                disperse = do_trans & (abbe_lane > 0.0) & ~lane_mat.thin_walled
                newly = disperse & ~collapsed
                thr_r = jnp.where(newly, thr_r * 3.0, thr_r)
                thr_g = jnp.where(disperse, 0.0, thr_g)
                thr_b = jnp.where(disperse, 0.0, thr_b)
                collapsed = collapsed | disperse
            off = jnp.where(transmitted, -_RAY_EPS, _RAY_EPS)
            origin = vwhere(
                vol_lane,
                vol_pos,
                vwhere(
                    pass_thru,
                    Vec3(hit_pos.x + direction.x * _RAY_EPS,
                         hit_pos.y + direction.y * _RAY_EPS,
                         hit_pos.z + direction.z * _RAY_EPS),
                    Vec3(hit_pos.x + ng.x * off, hit_pos.y + ng.y * off,
                         hit_pos.z + ng.z * off),
                ),
            )
            direction = vwhere(active, wi, direction)
            # pass-through keeps the previous vertex's MIS state
            prev_pdf = jnp.where(active & ~pass_thru, pdf,
                                 jnp.where(pass_thru, prev_pdf, 0.0))
            prev_delta = jnp.where(active & ~pass_thru, is_delta, prev_delta)
            # NEE coverage of this vertex, seen from the NEXT bounce: a
            # transmitted surface bounce leaves the hemisphere every NEE
            # strategy sampled, so it keeps full weight
            refl_side = vol_lane | ~transmitted
            upd = active & ~pass_thru
            prev_sun_nee = jnp.where(upd, sun_nee_on & refl_side,
                                     prev_sun_nee & pass_thru)
            prev_sun2 = jnp.where(upd, sun2_on & refl_side,
                                  prev_sun2 & pass_thru)
            prev_light_nee = jnp.where(
                upd, nee_lane & (lights.num_lights > 0) & refl_side,
                prev_light_nee & pass_thru)
            env_on_lane = (
                nee_lane & (scene.sky.env_nee_total > 0.0) & refl_side
                if config.env_nee else jnp.zeros((n,), bool))
            prev_env_nee = jnp.where(upd, env_on_lane,
                                     prev_env_nee & pass_thru)
            if config.ocean_caustics:
                is_ocean = mat_id == config.ocean_mat_id
                ocean_exit = jnp.where(
                    upd,
                    hit_lane & transmitted & is_ocean & ~front_face,
                    ocean_exit & pass_thru)
            if multi_bridge:
                # sticky for the rest of the path (STATE_FLAG_VOLUME_SCATTERED)
                # — fog events only: water-scatter vertices are outside the
                # bridge estimator's coverage, their forward chain stays on
                marked = (vol_lane & ~vol_water if config.water_scatter
                          else vol_lane)
                vol_scattered = vol_scattered | marked

            # kill lanes with dead throughput
            wmax = jnp.maximum(jnp.abs(wr), jnp.maximum(jnp.abs(wg), jnp.abs(wb)))
            active = active & (wmax > 0.0)

            # Russian roulette past depth 2 (reference: geometry.cuh RR).
            if depth >= 2:
                tmax = jnp.maximum(thr_r, jnp.maximum(thr_g, thr_b))
                p_continue = jnp.clip(tmax, 0.05, 1.0)
                r = random_1d(RandomTarget.RUSSIAN_ROULETTE, pixel_id, sample_id,
                              depth, bn=bn)
                active = active & (r < p_continue)
                inv_p = 1.0 / p_continue
                thr_r, thr_g, thr_b = thr_r * inv_p, thr_g * inv_p, thr_b * inv_p

            # ---- wavefront sort for the next depth (tasks_sort analog) ----
            if config.sort_wavefront:
                perm = jnp.argsort(
                    ray_sort_key(origin, direction, active, geo.bvh.bounds)
                )
                extras = [prev_sun_nee.astype(jnp.float32),
                          prev_sun2.astype(jnp.float32),
                          prev_light_nee.astype(jnp.float32),
                          prev_env_nee.astype(jnp.float32)]
                if config.ocean_caustics:
                    extras.append(ocean_exit.astype(jnp.float32))
                if multi_bridge:
                    extras.append(vol_scattered.astype(jnp.float32))
                if config.spectral:
                    extras += [collapsed.astype(jnp.float32),
                               lam3[0], lam3[1], lam3[2],
                               lam_pdf3[0], lam_pdf3[1], lam_pdf3[2]]
                if config.blue_noise:
                    extras += [jax.lax.bitcast_convert_type(b, jnp.float32)
                               for b in bn]
                cols = jnp.stack([
                    origin.x, origin.y, origin.z,
                    direction.x, direction.y, direction.z,
                    thr_r, thr_g, thr_b, rad_r, rad_g, rad_b,
                    prev_pdf,
                    prev_delta.astype(jnp.float32),
                    active.astype(jnp.float32),
                    miss_dir.x, miss_dir.y, miss_dir.z,
                    miss_thr_r, miss_thr_g, miss_thr_b,
                    miss_sun_weight,
                    miss_env_weight,
                    ever_missed.astype(jnp.float32),
                    jax.lax.bitcast_convert_type(
                        pixel_id.astype(jnp.uint32), jnp.float32),
                    jax.lax.bitcast_convert_type(sample_id, jnp.float32),
                    jax.lax.bitcast_convert_type(orig_lane, jnp.float32),
                    jax.lax.bitcast_convert_type(medium, jnp.float32),
                ] + extras, axis=-1)[perm]  # ONE bandwidth-bound row gather
                origin = Vec3(cols[:, 0], cols[:, 1], cols[:, 2])
                direction = Vec3(cols[:, 3], cols[:, 4], cols[:, 5])
                thr_r, thr_g, thr_b = cols[:, 6], cols[:, 7], cols[:, 8]
                rad_r, rad_g, rad_b = cols[:, 9], cols[:, 10], cols[:, 11]
                prev_pdf = cols[:, 12]
                prev_delta = cols[:, 13] > 0.5
                active = cols[:, 14] > 0.5
                miss_dir = Vec3(cols[:, 15], cols[:, 16], cols[:, 17])
                miss_thr_r, miss_thr_g, miss_thr_b = (
                    cols[:, 18], cols[:, 19], cols[:, 20])
                miss_sun_weight = cols[:, 21]
                miss_env_weight = cols[:, 22]
                ever_missed = cols[:, 23] > 0.5
                pixel_id = jax.lax.bitcast_convert_type(
                    cols[:, 24], jnp.uint32)
                sample_id = jax.lax.bitcast_convert_type(
                    cols[:, 25], jnp.uint32)
                orig_lane = jax.lax.bitcast_convert_type(
                    cols[:, 26], jnp.int32)
                medium = jax.lax.bitcast_convert_type(
                    cols[:, 27], jnp.uint32)
                ci = 28
                prev_sun_nee = cols[:, ci] > 0.5
                prev_sun2 = cols[:, ci + 1] > 0.5
                prev_light_nee = cols[:, ci + 2] > 0.5
                prev_env_nee = cols[:, ci + 3] > 0.5
                ci += 4
                if config.ocean_caustics:
                    ocean_exit = cols[:, ci] > 0.5
                    ci += 1
                if multi_bridge:
                    vol_scattered = cols[:, ci] > 0.5
                    ci += 1
                if config.spectral:
                    collapsed = cols[:, ci] > 0.5
                    lam3 = (cols[:, ci + 1], cols[:, ci + 2],
                            cols[:, ci + 3])
                    lam_pdf3 = (cols[:, ci + 4], cols[:, ci + 5],
                                cols[:, ci + 6])
                    ci += 7
                if config.blue_noise:
                    bn = tuple(
                        jax.lax.bitcast_convert_type(cols[:, ci + i],
                                                     jnp.uint32)
                        for i in range(len(bn)))
                    ci += len(bn)

    # ---- deferred sky: one SH evaluation for all recorded misses ----
    safe_dir = vwhere(ever_missed, miss_dir, Vec3.of(0.0, 1.0, 0.0, like=miss_dir))
    in_sun_disc = dot(safe_dir, sun_v) >= SUN_COS_RADIUS
    disc_w = jnp.where(in_sun_disc, miss_sun_weight, 0.0)
    # env MIS weight pairs with the ambient NEE strategy (1.0 when off):
    # ONE env-NEE pdf lookup for all recorded misses (deferred like the sky)
    if config.env_nee:
        from ..ops.sky import env_pdf

        env_w_m = jnp.where(
            miss_env_weight < 0.0, 1.0,
            mis_balance(miss_env_weight, env_pdf(scene.sky, safe_dir)))
    else:
        env_w_m = 1.0
    if config.spectral:
        from ..ops.sky import sky_radiance_spectral

        s0, s1, s2 = sky_radiance_spectral(scene.sky, safe_dir, lam3)
        sky_r = s0 * env_w_m + sun_rad3[0] * disc_w
        sky_g = s1 * env_w_m + sun_rad3[1] * disc_w
        sky_b = s2 * env_w_m + sun_rad3[2] * disc_w
        sky_rgb = Vec3(s0, s1, s2)  # for the cloud ambient below
    else:
        sky_rgb = sky_radiance(scene.sky, safe_dir, include_sun=False)
        sky_r = sky_rgb.x * env_w_m + sun_radiance[0] * disc_w
        sky_g = sky_rgb.y * env_w_m + sun_radiance[1] * disc_w
        sky_b = sky_rgb.z * env_w_m + sun_radiance[2] * disc_w
    if config.use_clouds:
        from ..ops.clouds import cloud_march

        if config.spectral:
            # clouds are near-gray scatterers: march in RGB against the
            # RGB sky, then uplift the inscatter to the slot wavelengths
            rgb_sky = sky_radiance(scene.sky, safe_dir, include_sun=False)
            (cr, cg, cb), cloud_t = cloud_march(
                scene.clouds, origin, safe_dir, sun_v,
                sun_radiance, (rgb_sky.x, rgb_sky.y, rgb_sky.z),
                steps=config.cloud_steps,
                layers=config.cloud_layers,
            )
            cr, cg, cb = spec3(cr, cg, cb)
        else:
            (cr, cg, cb), cloud_t = cloud_march(
                scene.clouds, origin, safe_dir, sun_v,
                sun_radiance, (sky_rgb.x, sky_rgb.y, sky_rgb.z),
                steps=config.cloud_steps,
                layers=config.cloud_layers,
            )
        sky_r = cr + sky_r * cloud_t
        sky_g = cg + sky_g * cloud_t
        sky_b = cb + sky_b * cloud_t
    add = ever_missed.astype(jnp.float32)
    rad_r = rad_r + miss_thr_r * sky_r * add
    rad_g = rad_g + miss_thr_g * sky_g * add
    rad_b = rad_b + miss_thr_b * sky_b * add

    if config.spectral:
        from ..ops.spectral import resolve_to_rgb

        rad_r, rad_g, rad_b = resolve_to_rgb(
            rad_r, rad_g, rad_b, lam3, lam_pdf3)
    radiance = jnp.stack([rad_r, rad_g, rad_b], axis=-1)
    if config.sort_wavefront:  # unscramble to original lane order
        radiance = jnp.zeros_like(radiance).at[orig_lane].set(radiance)
    return radiance, gbuffer, rays_traced


def _debug_shade(config, scene, hit, hit_lane, slot, mat_id, ns: Vec3):
    """Debug shading modes (reference: geometry.cuh:182-246, ShadingMode)."""
    geo = scene.geo
    mats = scene.materials
    mode = config.shading_mode
    hl = hit_lane.astype(jnp.float32)
    if mode == 1:  # ALBEDO
        return jnp.stack(
            [
                mats.albedo_r[mat_id] * hl,
                mats.albedo_g[mat_id] * hl,
                mats.albedo_b[mat_id] * hl,
            ],
            axis=-1,
        )
    if mode == 2:  # DEPTH
        d = jnp.where(hit_lane, hit.t, 0.0)
        d = d / jnp.maximum(jnp.max(d), 1e-6)
        return jnp.stack([d, d, d], axis=-1)
    if mode == 3:  # NORMAL
        return jnp.stack(
            [ns.x * 0.5 + 0.5, ns.y * 0.5 + 0.5, ns.z * 0.5 + 0.5], axis=-1
        ) * hl[..., None]
    if mode == 4:  # IDENTIFICATION — hash instance id to a color
        iid = geo.instance_id[slot].astype(jnp.uint32)
        h = iid * jnp.uint32(2654435761)
        return jnp.stack(
            [
                (h & 0xFF).astype(jnp.float32) / 255.0 * hl,
                ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0 * hl,
                ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0 * hl,
            ],
            axis=-1,
        )
    if mode == 5:  # LIGHTS — emissive surfaces highlighted
        emissive = (mats.flags[mat_id] & MAT_FLAG_EMISSIVE) != 0
        v = jnp.where(hit_lane & emissive, 1.0, jnp.where(hit_lane, 0.1, 0.0))
        return jnp.stack([v, v, v], axis=-1)
    raise ValueError(f"unknown shading mode {mode}")
