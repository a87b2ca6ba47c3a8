"""Scene → device pack.

Counterpart of the reference's host→device struct conversion + upload layer
(reference: src/luminary/device/device_structs.c, device_mesh.c,
device_material_manager.c): scene entities become a pytree of jnp arrays the
jitted render step closes over (the role of CUDA ``__constant__``
DeviceConstantMemory, reference device/cuda/utils.cuh:133).

v1 geometry model: instances are flattened — every instance's triangles are
transformed to world space and a single BVH is built over the union
(the reference's two-level IAS/GAS appears later with the traversal rework).
All shading attributes are stored in *leaf-slot order* so a traversal hit's
slot id directly indexes them with no indirection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bvh.builder import build_bvh
from ..bvh.wide import WIDE_LEAF, collapse_bvh8
from ..ops.traverse import DeviceBVH, pack_device_bvh
from ..ops.vec import Vec3
from ..scene.entities import Material, MaterialBaseSubstrate, TEXTURE_NONE
from ..scene.scene import Scene
from ..utils.log import info_message

LEAF_SIZE = WIDE_LEAF


def _euler_to_matrix(rotation) -> np.ndarray:
    """Rotation matrix matching the reference quaternion convention
    (host_math.c:6-21 + math.cuh quaternion_apply)."""
    rx, ry, rz = rotation
    cr, sr = np.cos(rx * 0.5), np.sin(rx * 0.5)
    cp, sp = np.cos(ry * 0.5), np.sin(ry * 0.5)
    cy, sy = np.cos(rz * 0.5), np.sin(rz * 0.5)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )


class DeviceMaterials(NamedTuple):
    """Packed material table (reference: DeviceMaterialCompressed,
    device_structs.h:214-236 — per-channel SoA float arrays; quantization is
    a later memory optimization)."""

    albedo_r: jnp.ndarray  # f32 [M]
    albedo_g: jnp.ndarray
    albedo_b: jnp.ndarray
    albedo_a: jnp.ndarray
    emission_r: jnp.ndarray  # f32 [M] (pre-scaled by emission_scale)
    emission_g: jnp.ndarray
    emission_b: jnp.ndarray
    roughness: jnp.ndarray  # f32 [M]
    metallic: jnp.ndarray  # f32 [M] 0/1
    ior: jnp.ndarray  # f32 [M]
    abbe: jnp.ndarray  # f32 [M] dispersion Abbe number (0 = none)
    flags: jnp.ndarray  # u32 [M] bit0: emission_active, bit1: translucent, bit2: thin_walled
    albedo_tex: jnp.ndarray  # i32 [M] (-1 = none)
    luminance_tex: jnp.ndarray  # i32 [M]
    roughness_tex: jnp.ndarray  # i32 [M]
    metallic_tex: jnp.ndarray  # i32 [M]
    normal_tex: jnp.ndarray  # i32 [M]


MAT_FLAG_EMISSIVE = 1
MAT_FLAG_TRANSLUCENT = 2
MAT_FLAG_THIN_WALLED = 4


class DeviceSky(NamedTuple):
    """Packed sky: baked environment + analytic sun (reference: device_sky.c
    LUT/HDRI machinery — see ops/atmosphere.py for the TPU design).

    The environment is stored as paired rows for the wavefront fetch: row i
    holds texel i's rgb in cols 0:3 and its +x (phi) neighbor's rgb in cols
    4:7, so a bilinear sample needs TWO row gathers (y0 and y1) instead of
    four (gathers cost per-INDEX on TPU; row width is nearly free)."""

    mode: jnp.ndarray  # i32 scalar
    constant_color: jnp.ndarray  # f32 [3]
    sun_dir: jnp.ndarray  # f32 [3] unit, toward sun
    sun_strength: jnp.ndarray  # f32 scalar
    env_rows: jnp.ndarray  # f32 [He*We, 16] — see env_to_rows
    env_h: jnp.ndarray  # i32 scalar
    env_w: jnp.ndarray  # i32 scalar
    # Environment NEE distribution (reference: sky_hdri.cuh importance +
    # direct_lighting ambient): a COARSE cell grid over the lat-long map
    # (tight enough for MIS; alias selection costs ONE row gather). Rows:
    # prob, own cell (bitcast i32), own pdf/sr, alias cell, alias pdf/sr,
    # pad x3. env_cell_pdf is the per-cell pdf/sr for the BSDF-miss MIS
    # lookup. env_nee_total = 0 disables the strategy (no env light).
    env_alias_rows: jnp.ndarray  # f32 [Kc, 8]
    env_cell_pdf: jnp.ndarray  # f32 [Kc]
    env_ch: jnp.ndarray  # i32 scalar — cell-grid height
    env_cw: jnp.ndarray  # i32 scalar — cell-grid width
    env_nee_total: jnp.ndarray  # f32 scalar
    # Spectral mode (reference: sky.cuh 8-wavelength atmosphere): the env
    # baked at the 8 SKY_BANDS wavelengths in the same paired-row layout
    # ([Hs*Ws, 16]: texel bands + phi-neighbor bands) + the solar-disc
    # spectrum. Dummy [1, 16] when spectral is off / non-DEFAULT skies
    # (the integrator then uplifts the RGB env instead).
    env_spec_rows: jnp.ndarray  # f32 [Hs*Ws, 32] — see env_to_rows_spec
    env_spec_h: jnp.ndarray  # i32 scalar
    env_spec_w: jnp.ndarray  # i32 scalar
    sun_disc_spec: jnp.ndarray  # f32 [8]
    # Aerial perspective (reference: SKY_INSCATTERING over hit segments):
    # per (view-zenith, sun-azimuth) rows carrying inscatter + transmittance
    # distance curves (ops/atmosphere.py bake_aerial_rows). Dummy [1, 128]
    # when off / non-DEFAULT skies.
    aerial_rows: jnp.ndarray  # f32 [NU*NS, 128]
    sun_disc_radiance: jnp.ndarray  # f32 [3] transmittance-tinted disc radiance
    geometry_offset: jnp.ndarray  # f32 [3]
    moon_dir: jnp.ndarray  # f32 [3] unit, toward moon
    moon_tex_offset: jnp.ndarray  # f32 scalar
    stars_seed: jnp.ndarray  # i32 scalar
    stars_count: jnp.ndarray  # i32 scalar
    stars_intensity: jnp.ndarray  # f32 scalar


class DeviceSceneGeo(NamedTuple):
    """Leaf-slot-ordered world-space geometry + BVH (per-component tables —
    see ops/vec.py for why [P, 3]-style arrays are banned from the hot path)."""

    bvh: DeviceBVH
    n0: "Vec3"  # [P] shading normal at corner 0 (world, unit)
    n1: "Vec3"
    n2: "Vec3"
    uv_u: "Vec3"  # [P] texture u at corners (0, 1, 2) packed in .x/.y/.z
    uv_v: "Vec3"  # [P] texture v at corners (0, 1, 2)
    material_id: jnp.ndarray  # i32 [P]
    instance_id: jnp.ndarray  # i32 [P]
    prim_id: jnp.ndarray  # i32 [P] original triangle index within its mesh
    face_normal: "Vec3"  # [P] geometric normal (world, unit)


class DeviceParticles(NamedTuple):
    """Tiled particle field (reference: device_particle.c quad buffer + the
    tile-wrapped OptiX trace, optix_kernel_raytrace.cu:96-117): a SECOND
    small BVH over the quad soup in tile coordinates [0, scale)³. The
    integrator wraps per-lane ray origins (plus the per-sample motion
    offset = unit_dir·speed·time, giving motion blur) into the tile and
    runs the ordinary 16-wide traversal against this table. Particles are
    NOT occluders (the reference likewise traces them only for delta
    paths, "negligible contribution")."""

    bvh: "DeviceBVH"  # quads in [0, scale)³
    scale: jnp.ndarray  # f32 tile edge length
    motion: jnp.ndarray  # f32 [3] direction · speed
    albedo: jnp.ndarray  # f32 [3]


class DeviceScene(NamedTuple):
    geo: DeviceSceneGeo
    materials: DeviceMaterials
    sky: DeviceSky
    lights: "DeviceLights"
    fog: "DeviceFog"
    water: "DeviceWater"
    textures: "DeviceTextures"
    clouds: "DeviceClouds"
    # Packed shade tables (SHP_*/SHA_* maps below): 8 quantized slots per
    # 128-col i32 row keeps each table ≤ ~11 MB at 164k slots — under the
    # measured ~17 MB gather knee (tools/microbench_tablesize.py: ≤16.8 MB
    # tables gather at ~4.2 ns/index, larger ones at ~12.4 ns — a 3x on
    # every per-hit fetch). The TPU shape of the reference's 64-B packed
    # DeviceTriangle / 32-B DeviceMaterialCompressed (device_structs.h:
    # 214-281, oct normals + half UVs via device_packing.h).
    shade_hot: jnp.ndarray  # i32 [ceil(P/8), 128] — every-hit fields
    shade_aux: jnp.ndarray  # i32 [ceil(P/8), 128] — texture/spectral fields
    shade_micro: jnp.ndarray  # f32 [P, 16] — micro cell weights (has_micro)
    # COMPACT per-light rows for NEE candidate evaluation (LSR_* columns),
    # FUSED with the alias table: RIS gathers one of these per candidate;
    # dense light-index order keeps the table VMEM-resident (see the LSR_*
    # note below).
    light_slot_rows: jnp.ndarray  # f32 [L, 37] ([L, 69] with micro weights)
    particles: "DeviceParticles | None" = None


# Packed shade tables: ONE gather per hit fetches everything shading needs,
# and 8 quantized slots share each 128-col i32 row (row = slot >> 3,
# sub = slot & 7, physical col = logical_col * 8 + sub) so the table stays
# under the ~17 MB gather knee. Quantization (reference: device_structs.h
# 32-B materials / 64-B triangles, device_packing.h oct normals + half UVs):
# normals → octahedral snorm16 pairs, colors/roughness/ior → f16 pairs,
# ids → u16 pairs. MIS-critical pdf fields (sel_pdf, area) stay exact f32 so
# the NEE sampler side (LSR rows) and the BSDF-hit side keep bit-identical
# nominal pdfs.
SHP_SUB = 8           # slots per packed row
# --- hot table (gathered at every hit) logical columns ---
SHP_N0 = 0            # oct snorm16 shading normal, corner 0
SHP_N1 = 1
SHP_N2 = 2
SHP_FACE = 3          # oct snorm16 geometric normal
SHP_IDS = 4           # mat_id u16 | (instance_id + 1) u16  (0 = invalid)
SHP_ALB_RG = 5        # albedo r|g f16
SHP_ALB_BA = 6        # albedo b|a f16
SHP_EM_RG = 7         # emission r|g f16 (pre-scaled)
SHP_EM_B_ROUGH = 8    # emission b | roughness f16
SHP_METAL_IOR = 9     # metallic | ior f16
SHP_FLAGS = 10        # u32 material flags
SHP_SEL_PDF = 11      # f32 light selection pdf of this slot (0 = not a light)
SHP_AREA = 12         # f32 triangle area
SHP_PRIM = 13         # i32 source primitive id
SHP_COLS = 16
# --- aux table (gathered only when textures/spectral are active) ---
SHA_UV0 = 0           # u0|v0 f16
SHA_UV1 = 1           # u1|v1
SHA_UV2 = 2           # u2|v2
SHA_TEX_AR = 3        # albedo_tex i16 | rough_tex i16 (-1 = none)
SHA_TEX_MN = 4        # metallic_tex i16 | normal_tex i16
SHA_TEX_L_ABBE = 5    # luminance_tex i16 | abbe f16
SHA_LOD = 6           # f32 log2(res_tex * sqrt(uv_area / world_area))
SHA_E1XY = 7          # e1.x|e1.y f16 (normal-map tangent frame)
SHA_E1Z2X = 8         # e1.z|e2.x f16
SHA_E2YZ = 9          # e2.y|e2.z f16
SHA_COLS = 16


# ---- packed-row jnp decoders (consumed by render/wavefront.py) ----

def shp_col(planar_rows, sub, c):
    """Planar packed rows [128, N] i32 + sub = slot & 7 → logical col c
    ([N] i32): a 7-deep where-chain over the 8 adjacent physical rows —
    pure VPU selects over flat rows, no extra gathers."""
    v = planar_rows[c * SHP_SUB]
    for s in range(1, SHP_SUB):
        v = jnp.where(sub == s, planar_rows[c * SHP_SUB + s], v)
    return v


def unpack_f16_pair(bits_i32):
    """i32 of two f16 halves → (lo, hi) f32 arrays."""
    b = jax.lax.bitcast_convert_type(bits_i32, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        (b & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (b >> 16).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    return lo, hi


def unpack_i16_pair(bits_i32):
    """i32 of two i16 halves → (lo, hi) sign-extended i32 arrays."""
    lo = (bits_i32 << 16) >> 16
    hi = bits_i32 >> 16
    return lo, hi


def unpack_oct_snorm16(bits_i32):
    """Octahedral snorm16 pair → unit direction components (x, y, z)."""
    u = ((bits_i32 << 16) >> 16).astype(jnp.float32) * (1.0 / 32767.0)
    v = (bits_i32 >> 16).astype(jnp.float32) * (1.0 / 32767.0)
    y = 1.0 - jnp.abs(u) - jnp.abs(v)
    neg = y < 0.0
    sx = jnp.where(u >= 0.0, 1.0, -1.0)
    sz = jnp.where(v >= 0.0, 1.0, -1.0)
    x = jnp.where(neg, (1.0 - jnp.abs(v)) * sx, u)
    z = jnp.where(neg, (1.0 - jnp.abs(u)) * sz, v)
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-12))
    return x * inv, y * inv, z * inv

# light-sample row columns (light_slot_rows — COMPACT [L, 37|69], one row
# per EMISSIVE triangle in dense light-index order, NOT per slot: a
# slot-space table at 164k slots (84 MB tiled) measured 73 ms per 2M-lane
# gather because every row access DMAs a full 4 KB HBM tile; the compact
# table stays VMEM-resident for typical emitter counts (~3 ms). VMEM
# budget: at 37 cols (148 B/row) ~1 MB holds ~7k emitters, the 69-col
# micro variant ~3.6k; beyond ~50k emitters the table approaches the
# HBM-tile regime the compaction exists to avoid — if such scenes appear,
# fall back to packing the plain 18-col table (sample_light_point's
# `>= fused_cols` guard already routes that shape to the two-gather path).
LSR_V0 = 0
LSR_E1 = 3
LSR_E2 = 6
LSR_FACE_N = 9
LSR_EMISSION = 12
LSR_AREA = 15
# The light's ALIAS-table selection pdf — the nominal MIS pdf shared with
# the BSDF-hit side (shade row SHADE_SEL_PDF), regardless of which RIS
# candidate process (alias or light tree) actually drew the light. Keeping
# MIS on one pdf function for both strategies keeps the weights summing to 1.
LSR_SELECT_PDF = 16
LSR_SLOT = 17  # the light's REAL leaf-slot id (bitcast i32)
LSR_COLS = 18
# Fused alias-candidate extension (see sample_light_point, ops/lights.py):
# an alias draw needs prob[j] + the 18-col block of EITHER j or alias[j].
# Denormalizing the alias partner's whole block into the row turns the two
# DEPENDENT gathers per RIS candidate (alias cell -> light row) into ONE
# gather + a per-column select — gathers cost per INDEX on TPU with row
# width nearly free to 128 cols (docs/PERF_NOTES.md), so the wider row is
# ~free while the dependent-gather latency halves (tools/nee_probe.py: the
# two gathers were ~all of the ~5 ms/candidate cost).
LSR_ALIAS_PROB = 18      # alias acceptance prob of uniform cell j
LSR_ALIAS_ROW = 19       # cols 19:37 — the 18-col block of alias[j]
LSR_FUSED_COLS = 37
LSR_MICRO_OWN = 37       # cols 37:53 — raw micro cell weights of j
LSR_MICRO_ALIAS = 53     # cols 53:69 — raw micro cell weights of alias[j]
LSR_FUSED_MICRO_COLS = 69


def pack_light_slot_rows(geo: DeviceSceneGeo, materials: DeviceMaterials,
                         lights) -> np.ndarray:
    """Compact fused light rows: [L, 37] ([L, 69] with micro weights).

    cols 0:18 are the classic LSR block for dense light j (tree-candidate
    gathers read only these); cols 18+ fuse the alias table so one gather
    serves a whole alias-drawn RIS candidate.

    Size note: the compact table's win came from the gather source staying
    VMEM-resident (~3 ms vs ~73 ms per 2M-lane gather when it spilled to
    HBM-tile DMAs). The fused rows are 148 B (276 B with micro) — at a
    ~16 MB VMEM working set that holds to L ≈ 60-100k emitters. Beyond
    that, sample_light_point's >= LSR_FUSED_COLS shape guard already
    accepts the plain 18-col table (72 B/row, ~2.2x more headroom) as a
    fallback; switch here if a giant-L scene measures regressed NEE.
    """
    slots = np.asarray(lights.slot).astype(np.int64)
    l = max(len(slots), 1)
    base = np.zeros((l, LSR_COLS), np.float32)
    ncols = LSR_FUSED_MICRO_COLS if lights.has_micro else LSR_FUSED_COLS
    if int(lights.num_lights) == 0:
        return np.zeros((l, ncols), np.float32)
    s = slots

    def put3(col, v):
        base[:, col + 0] = np.asarray(v.x)[s]
        base[:, col + 1] = np.asarray(v.y)[s]
        base[:, col + 2] = np.asarray(v.z)[s]

    put3(LSR_V0, geo.bvh.tri_v0)
    put3(LSR_E1, geo.bvh.tri_e1)
    put3(LSR_E2, geo.bvh.tri_e2)
    put3(LSR_FACE_N, geo.face_normal)
    m = np.asarray(geo.material_id).astype(np.int64)[s]
    base[:, LSR_EMISSION + 0] = np.asarray(materials.emission_r)[m]
    base[:, LSR_EMISSION + 1] = np.asarray(materials.emission_g)[m]
    base[:, LSR_EMISSION + 2] = np.asarray(materials.emission_b)[m]
    base[:, LSR_AREA] = np.asarray(lights.slot_area)[s]
    base[:, LSR_SELECT_PDF] = np.asarray(lights.select_pdf)
    base[:, LSR_SLOT] = s.astype(np.int32).view(np.float32)

    alias = np.asarray(lights.alias).astype(np.int64)
    rows = np.zeros((l, ncols), np.float32)
    rows[:, :LSR_COLS] = base
    rows[:, LSR_ALIAS_PROB] = np.asarray(lights.prob)
    rows[:, LSR_ALIAS_ROW:LSR_ALIAS_ROW + LSR_COLS] = base[alias]
    if lights.has_micro:
        mr = np.asarray(lights.micro_rows).astype(np.float32)
        rows[:, LSR_MICRO_OWN:LSR_MICRO_OWN + 16] = mr
        rows[:, LSR_MICRO_ALIAS:LSR_MICRO_ALIAS + 16] = mr[alias]
    return rows


def _f16_pair_np(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Two float arrays → one i32 array carrying the f16 halves."""
    l16 = lo.astype(np.float16).view(np.uint16).astype(np.uint32)
    h16 = hi.astype(np.float16).view(np.uint16).astype(np.uint32)
    return (l16 | (h16 << 16)).view(np.int32)


def _i16_pair_np(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    l16 = lo.astype(np.int16).view(np.uint16).astype(np.uint32)
    h16 = hi.astype(np.int16).view(np.uint16).astype(np.uint32)
    return (l16 | (h16 << 16)).view(np.int32)


def _oct_snorm16_np(v3) -> np.ndarray:
    """Unit-vector Vec3-of-np (or [K,3]) → octahedral snorm16 pair i32."""
    if hasattr(v3, "x"):
        n = np.stack([np.asarray(v3.x), np.asarray(v3.y),
                      np.asarray(v3.z)], axis=-1)
    else:
        n = np.asarray(v3)
    a = np.abs(n).sum(axis=-1, keepdims=True)
    v = n / np.maximum(a, 1e-12)
    uv = v[..., [0, 2]].copy()
    neg = v[..., 1] < 0.0
    flip = (1.0 - np.abs(uv[..., ::-1])) * np.where(uv >= 0.0, 1.0, -1.0)
    uv[neg] = flip[neg]
    q = np.clip(np.round(uv * 32767.0), -32767, 32767).astype(np.int32)
    return ((q[..., 0] & 0xFFFF) | (q[..., 1] << 16)).astype(np.int32)


def _pack8(cols: dict, p: int, n_cols: int) -> np.ndarray:
    """{logical col: i32 [P]} → packed [ceil(P/8), 128] i32: slot s lands at
    [s >> 3, logical * 8 + (s & 7)]."""
    r = (p + SHP_SUB - 1) // SHP_SUB
    out = np.zeros((r, n_cols * SHP_SUB), np.int32)
    for c, v in cols.items():
        tmp = np.zeros(r * SHP_SUB, np.int32)
        tmp[:p] = v if v.dtype == np.int32 else v.view(np.int32)
        out[:, c * SHP_SUB:(c + 1) * SHP_SUB] = tmp.reshape(r, SHP_SUB)
    return out


def pack_shade_packed(geo: DeviceSceneGeo, materials: DeviceMaterials,
                      lights, tex_res=None):
    """Packed per-slot shade tables (numpy): (hot [R, 128] i32,
    aux [R, 128] i32, micro f32 [P, 16] | [1, 16]) — SHP_*/SHA_* maps.
    tex_res: per-texture level-0 page resolution (ops/textures.py
    page_resolutions) for the mip LOD base — PAGE_RES when absent."""
    p = np.asarray(geo.material_id).shape[0]
    mat = np.asarray(geo.material_id).astype(np.int64)
    inst = np.asarray(geo.instance_id).astype(np.int64)

    def f32(v):
        return np.asarray(v, np.float32).view(np.int32)

    ids = ((mat & 0xFFFF) | (((inst + 1) & 0xFFFF) << 16)).astype(np.uint32)
    hot = {
        SHP_N0: _oct_snorm16_np(geo.n0),
        SHP_N1: _oct_snorm16_np(geo.n1),
        SHP_N2: _oct_snorm16_np(geo.n2),
        SHP_FACE: _oct_snorm16_np(geo.face_normal),
        SHP_IDS: ids.view(np.int32),
        SHP_ALB_RG: _f16_pair_np(np.asarray(materials.albedo_r)[mat],
                                 np.asarray(materials.albedo_g)[mat]),
        SHP_ALB_BA: _f16_pair_np(np.asarray(materials.albedo_b)[mat],
                                 np.asarray(materials.albedo_a)[mat]),
        SHP_EM_RG: _f16_pair_np(np.asarray(materials.emission_r)[mat],
                                np.asarray(materials.emission_g)[mat]),
        SHP_EM_B_ROUGH: _f16_pair_np(np.asarray(materials.emission_b)[mat],
                                     np.asarray(materials.roughness)[mat]),
        SHP_METAL_IOR: _f16_pair_np(np.asarray(materials.metallic)[mat],
                                    np.asarray(materials.ior)[mat]),
        SHP_FLAGS: np.asarray(materials.flags)[mat].astype(
            np.uint32).view(np.int32),
        SHP_SEL_PDF: f32(lights.slot_select_pdf),
        SHP_AREA: f32(lights.slot_area),
        SHP_PRIM: np.asarray(geo.prim_id).astype(np.int32),
    }

    # mip LOD base: log2(res_tex * sqrt(uv_area / world_area)) per slot,
    # using the slot's albedo texture's OWN page resolution
    from ..ops.textures import PAGE_RES

    at = np.asarray(materials.albedo_tex)[mat]
    if tex_res is not None and len(tex_res):
        res_slot = np.where(
            at >= 0, np.asarray(tex_res)[np.maximum(at, 0)], PAGE_RES
        ).astype(np.float64)
    else:
        res_slot = np.float64(PAGE_RES)
    e1 = np.stack([np.asarray(geo.bvh.tri_e1.x), np.asarray(geo.bvh.tri_e1.y),
                   np.asarray(geo.bvh.tri_e1.z)], -1)
    e2 = np.stack([np.asarray(geo.bvh.tri_e2.x), np.asarray(geo.bvh.tri_e2.y),
                   np.asarray(geo.bvh.tri_e2.z)], -1)
    world_area2 = np.maximum(
        np.linalg.norm(np.cross(e1, e2), axis=-1), 1e-20
    )
    uu = np.stack([np.asarray(geo.uv_u.x), np.asarray(geo.uv_u.y),
                   np.asarray(geo.uv_u.z)], -1)
    vv = np.stack([np.asarray(geo.uv_v.x), np.asarray(geo.uv_v.y),
                   np.asarray(geo.uv_v.z)], -1)
    du1, dv1 = uu[:, 1] - uu[:, 0], vv[:, 1] - vv[:, 0]
    du2, dv2 = uu[:, 2] - uu[:, 0], vv[:, 2] - vv[:, 0]
    uv_area2 = np.abs(du1 * dv2 - du2 * dv1)
    lod_base = np.where(
        uv_area2 > 1e-20,
        np.log2(res_slot * np.sqrt(uv_area2 / world_area2) + 1e-20),
        0.0,
    ).astype(np.float32)

    aux = {
        SHA_UV0: _f16_pair_np(uu[:, 0], vv[:, 0]),
        SHA_UV1: _f16_pair_np(uu[:, 1], vv[:, 1]),
        SHA_UV2: _f16_pair_np(uu[:, 2], vv[:, 2]),
        SHA_TEX_AR: _i16_pair_np(at, np.asarray(materials.roughness_tex)[mat]),
        SHA_TEX_MN: _i16_pair_np(np.asarray(materials.metallic_tex)[mat],
                                 np.asarray(materials.normal_tex)[mat]),
        SHA_TEX_L_ABBE: (
            (np.asarray(materials.luminance_tex)[mat].astype(np.int16)
             .view(np.uint16).astype(np.uint32))
            | (np.asarray(materials.abbe)[mat].astype(np.float16)
               .view(np.uint16).astype(np.uint32) << 16)
        ).view(np.int32),
        SHA_LOD: lod_base.view(np.int32),
        SHA_E1XY: _f16_pair_np(e1[:, 0], e1[:, 1]),
        SHA_E1Z2X: _f16_pair_np(e1[:, 2], e2[:, 0]),
        SHA_E2YZ: _f16_pair_np(e2[:, 1], e2[:, 2]),
    }

    if getattr(lights, "has_micro", False):
        # dense [L, 16] micro weights → slot space, normalized so the hit
        # side multiplies SEL_PDF/AREA directly (16·w/Σw). Kept f32 in its
        # own table: the sampler side uses the same f32 weights (LSR micro
        # cols), and the MIS nominal pdfs must match across strategies.
        mr = np.asarray(lights.micro_rows)
        micro = np.ones((p, 16), np.float32)
        micro[np.asarray(lights.slot)] = (
            16.0 * mr / np.maximum(mr.sum(axis=1, keepdims=True), 1e-20))
    else:
        micro = np.zeros((1, 16), np.float32)

    return (_pack8(hot, p, SHP_COLS), _pack8(aux, p, SHA_COLS), micro)


def sun_direction(azimuth: float, altitude: float) -> np.ndarray:
    """reference: device_structs.c:136-139."""
    return np.array(
        [
            np.cos(azimuth) * np.cos(altitude),
            np.sin(altitude),
            np.sin(azimuth) * np.cos(altitude),
        ],
        dtype=np.float32,
    )


def procedural_materials(scene: Scene) -> list[Material]:
    """Synthetic materials appended after user materials: ocean water and
    particle albedo (ids are num_materials + 0 / + 1 when active)."""
    out = []
    if scene.ocean.active:
        out.append(
            Material(
                albedo=(0.9, 0.95, 1.0, 1.0),
                base_substrate=MaterialBaseSubstrate.TRANSLUCENT,
                refraction_index=scene.ocean.refractive_index,
                roughness=0.05,
            )
        )
    if scene.particles.active:
        a = scene.particles.albedo
        out.append(Material(albedo=(a[0], a[1], a[2], 1.0), roughness=1.0))
    return out


def pack_materials(scene: Scene) -> DeviceMaterials:
    # Materialize the GGX energy LUT outside any trace (it is cached and then
    # closed over as a constant by the jitted render step).
    from ..ops.ggx import ggx_energy_lut

    ggx_energy_lut()
    mats = (scene.materials or [Material()]) + procedural_materials(scene)
    m = len(mats)

    def tex(t):
        return -1 if t == TEXTURE_NONE else int(t)

    flags = np.zeros(m, np.uint32)
    for i, mat in enumerate(mats):
        f = 0
        if mat.emission_active:
            f |= MAT_FLAG_EMISSIVE
        if mat.base_substrate == MaterialBaseSubstrate.TRANSLUCENT:
            f |= MAT_FLAG_TRANSLUCENT
        if mat.thin_walled:
            f |= MAT_FLAG_THIN_WALLED
        flags[i] = f

    albedo = np.asarray([mat.albedo for mat in mats], np.float32)
    emission = np.asarray(
        [np.asarray(mat.emission) * mat.emission_scale for mat in mats], np.float32
    )
    return DeviceMaterials(
        albedo_r=albedo[:, 0].copy(),
        albedo_g=albedo[:, 1].copy(),
        albedo_b=albedo[:, 2].copy(),
        albedo_a=albedo[:, 3].copy(),
        emission_r=emission[:, 0].copy(),
        emission_g=emission[:, 1].copy(),
        emission_b=emission[:, 2].copy(),
        roughness=np.asarray([mat.roughness for mat in mats], np.float32),
        metallic=np.asarray([1.0 if mat.metallic else 0.0 for mat in mats], np.float32),
        ior=np.asarray([mat.refraction_index for mat in mats], np.float32),
        abbe=np.asarray(
            [getattr(mat, "abbe", 0.0) for mat in mats], np.float32),
        flags=flags,
        albedo_tex=np.asarray([tex(mat.albedo_tex) for mat in mats], np.int32),
        luminance_tex=np.asarray([tex(mat.luminance_tex) for mat in mats], np.int32),
        roughness_tex=np.asarray([tex(mat.roughness_tex) for mat in mats], np.int32),
        metallic_tex=np.asarray([tex(mat.metallic_tex) for mat in mats], np.int32),
        normal_tex=np.asarray([tex(mat.normal_tex) for mat in mats], np.int32),
    )


def env_to_rows(env: np.ndarray) -> np.ndarray:
    """Lat-long env [H, W, 3] → bilinear-quad rows [H*W, 16]: cols 0:8 the
    texel + phi-neighbor pair at row y, cols 8:16 the same pair at row y+1
    (clamped) — the whole bilinear footprint in ONE row gather (gathers
    cost per INDEX on TPU; see sample_env_rows)."""
    h, w = env.shape[:2]
    rows = np.zeros((h * w, 16), np.float32)
    rows[:, 0:3] = env.reshape(-1, 3)
    rows[:, 4:7] = np.roll(env, -1, axis=1).reshape(-1, 3)
    dn = env[np.minimum(np.arange(h) + 1, h - 1)]
    rows[:, 8:11] = dn.reshape(-1, 3)
    rows[:, 12:15] = np.roll(dn, -1, axis=1).reshape(-1, 3)
    return rows


def env_to_rows_spec(env8: np.ndarray) -> np.ndarray:
    """8-band spectral env [H, W, 8] → bilinear-quad rows [H*W, 32]: bands
    at (y, x), (y, x+1), (y+1, x), (y+1, x+1) — one gather per fetch."""
    h, w = env8.shape[:2]
    rows = np.zeros((h * w, 32), np.float32)
    rows[:, 0:8] = env8.reshape(-1, 8)
    rows[:, 8:16] = np.roll(env8, -1, axis=1).reshape(-1, 8)
    dn = env8[np.minimum(np.arange(h) + 1, h - 1)]
    rows[:, 16:24] = dn.reshape(-1, 8)
    rows[:, 24:32] = np.roll(dn, -1, axis=1).reshape(-1, 8)
    return rows


def _latlong_dirs(height: int, width: int) -> np.ndarray:
    """Unit direction per lat-long texel center → f32 [H*W, 3] (y up)."""
    v = (np.arange(height) + 0.5) / height
    u = (np.arange(width) + 0.5) / width
    theta = v * np.pi
    phi = u * 2.0 * np.pi
    st = np.sin(theta)[:, None]
    d = np.stack(
        [
            np.broadcast_to(st * np.cos(phi)[None, :], (height, width)),
            np.broadcast_to(np.cos(theta)[:, None], (height, width)),
            np.broadcast_to(st * np.sin(phi)[None, :], (height, width)),
        ],
        axis=-1,
    )
    return d.reshape(-1, 3).astype(np.float32)


def _bake_hdri_extras(scene: Scene, env: np.ndarray, sun_dir, sun_disc):
    """HDRI mode folds clouds + moon + stars into the baked map (reference:
    SKY_COMPUTE_HDRI path-traces the full sky, device_sky.c:660); only the
    solar disc stays analytic at runtime."""
    from types import SimpleNamespace

    from ..ops.clouds import pack_clouds
    from ..ops.sky import moon_radiance, stars_radiance
    from ..ops.vec import Vec3

    h, w = env.shape[:2]
    dirs = _latlong_dirs(h, w)
    d = Vec3(jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]), jnp.asarray(dirs[:, 2]))
    sky = scene.sky
    dsky = SimpleNamespace(
        sun_dir=jnp.asarray(sun_dir),
        moon_dir=jnp.asarray(sun_direction(sky.moon_azimuth, sky.moon_altitude)),
        moon_tex_offset=jnp.float32(sky.moon_tex_offset),
        stars_seed=jnp.int32(sky.stars_seed),
        stars_count=jnp.int32(sky.stars_count),
        stars_intensity=jnp.float32(sky.stars_intensity),
    )
    moon, in_moon = moon_radiance(dsky, d)
    sr, sg, sb = stars_radiance(dsky, d)
    er = env[:, :, 0].reshape(-1) + np.asarray(moon + jnp.where(in_moon, 0.0, sr))
    eg = env[:, :, 1].reshape(-1) + np.asarray(moon + jnp.where(in_moon, 0.0, sg))
    eb = env[:, :, 2].reshape(-1) + np.asarray(moon + jnp.where(in_moon, 0.0, sb))

    from ..ops.clouds import active_layer_indices, cloud_march

    cloud_layers = active_layer_indices(scene.cloud)
    if cloud_layers:
        cl = pack_clouds(scene.cloud)
        origin = Vec3(
            jnp.full((h * w,), float(scene.camera.pos[0]), jnp.float32),
            jnp.full((h * w,), max(float(scene.camera.pos[1]), 0.1), jnp.float32),
            jnp.full((h * w,), float(scene.camera.pos[2]), jnp.float32),
        )
        sun_v = Vec3(
            jnp.float32(sun_dir[0]), jnp.float32(sun_dir[1]), jnp.float32(sun_dir[2])
        )
        (cr, cg, cb), ct = jax.jit(
            lambda o, dd: cloud_march(
                cl, o, dd, sun_v, jnp.asarray(sun_disc),
                (jnp.asarray(er), jnp.asarray(eg), jnp.asarray(eb)),
                steps=int(min(max(scene.cloud.steps, 16), 96)),
                layers=cloud_layers,
            )
        )(origin, d)
        er = np.asarray(cr + jnp.asarray(er) * ct)
        eg = np.asarray(cg + jnp.asarray(eg) * ct)
        eb = np.asarray(cb + jnp.asarray(eb) * ct)
    return np.stack([er, eg, eb], axis=-1).reshape(h, w, 3).astype(np.float32)


def pack_sky(scene: Scene, env_res: tuple[int, int] | None = None) -> DeviceSky:
    """Build atmosphere LUTs and bake the sky environment (reference: the
    sky LUT + HDRI build stages of device_manager.c:334-366).

    DEFAULT mode bakes the atmosphere to a screen-resolution-matched env map
    that misses sample bilinearly (the TPU answer to the reference's per-ray
    LUT raymarch). HDRI mode (reference: device_sky.c:660 sky-to-HDRI bake,
    cuda/sky_hdri.cuh) bakes at ``sky.hdri_dim`` and additionally folds in
    the cloud layer, moon, and stars — or uses a user-supplied lat-long
    image (``scene.sky_hdri``) verbatim. The solar disc stays analytic in
    all modes so it is pixel-sharp at any env resolution."""
    from ..ops.atmosphere import (
        atmo_params_from_sky,
        bake_sky_envmap,
        build_multiscatter_lut,
        build_transmittance_lut,
        sample_transmittance_lut,
    )
    from ..ops.sky import SUN_IRRADIANCE, SUN_RADIANCE

    sky = scene.sky
    sun_dir = sun_direction(sky.azimuth, sky.altitude)
    is_constant = int(sky.mode) == 2
    is_hdri = int(sky.mode) == 1
    user_env = getattr(scene, "sky_hdri", None)

    if env_res is None:
        if is_hdri:
            w = max(256, min(2048, int(sky.hdri_dim)))
        else:
            w = max(128, min(1024, 2 * scene.settings.width))
        env_res = (w // 2, w)

    if is_constant:
        env = np.zeros((4, 8, 3), np.float32)
        sun_disc = np.zeros((3,), np.float32)
    elif is_hdri and user_env is not None:
        env = np.asarray(user_env, np.float32)
        if env.ndim != 3 or env.shape[-1] < 3:
            raise ValueError("sky_hdri must be a [H, W, >=3] lat-long image")
        env = env[..., :3]
        sun_disc = np.zeros((3,), np.float32)  # lighting comes from the map
    else:
        p = atmo_params_from_sky(sky)
        sun_dir_j = jnp.asarray(sun_dir)
        t_lut = jax.jit(build_transmittance_lut)(p)
        ms_lut = jax.jit(build_multiscatter_lut)(p, t_lut)
        h_obs = jnp.float32(max(float(sky.geometry_offset[1]), 0.001))
        sun_irr = jnp.float32(SUN_IRRADIANCE * sky.sun_strength)
        env = bake_sky_envmap(
            p, t_lut, ms_lut, h_obs, sun_dir_j, sun_irr,
            width=env_res[1], height=env_res[0],
            steps=int(min(max(sky.steps, 8), 64)),
        )
        sun_t = sample_transmittance_lut(t_lut, h_obs, sun_dir_j[1])
        sun_disc = sun_t * jnp.float32(SUN_RADIANCE * sky.sun_strength)
        if is_hdri:
            env = _bake_hdri_extras(scene, np.asarray(env), sun_dir, sun_disc)
        env = np.asarray(env)

    # 8-wavelength spectral bake (DEFAULT-mode atmosphere only; HDRI/user
    # maps and constant skies uplift their RGB at shading time instead)
    env_spec = np.zeros((1, 1, 8), np.float32)
    sun_disc_spec = np.zeros((8,), np.float32)
    if (getattr(scene.settings, "spectral_rendering", False)
            and not is_constant and not (is_hdri and user_env is not None)):
        from ..ops.spectral import sun_irradiance_bands

        p8 = atmo_params_from_sky(sky, spectral=True)
        t_lut8 = jax.jit(build_transmittance_lut)(p8)
        ms_lut8 = jax.jit(build_multiscatter_lut)(p8, t_lut8)
        h_obs = jnp.float32(max(float(sky.geometry_offset[1]), 0.001))
        sun_dir_j = jnp.asarray(sun_dir)
        bands = jnp.asarray(sun_irradiance_bands())
        irr8 = bands * jnp.float32(SUN_IRRADIANCE * sky.sun_strength)
        sw = max(env_res[1] // 2, 64)
        env_spec = np.asarray(bake_sky_envmap(
            p8, t_lut8, ms_lut8, h_obs, sun_dir_j, irr8,
            width=sw, height=sw // 2,
            steps=int(min(max(sky.steps, 8), 64)),
        ))
        t_sun8 = sample_transmittance_lut(t_lut8, h_obs, sun_dir_j[1])
        sun_disc_spec = np.asarray(
            t_sun8 * bands * jnp.float32(SUN_RADIANCE * sky.sun_strength))

    # Aerial perspective rows: DEFAULT-mode atmosphere only (HDRI bakes the
    # full-path atmosphere into the map; constant skies have no medium).
    aerial = np.zeros((1, 128), np.float32)
    if (not is_constant and not is_hdri
            and getattr(scene.settings, "aerial_perspective", True)):
        from ..ops.atmosphere import bake_aerial_rows

        aerial = np.asarray(bake_aerial_rows(
            p, t_lut, ms_lut,
            jnp.float32(max(float(sky.geometry_offset[1]), 0.001)),
            jnp.asarray(sun_dir),
            jnp.float32(SUN_IRRADIANCE * sky.sun_strength),
        ))

    alias_rows, cell_pdf, ch, cw, nee_total = _build_env_nee(
        np.asarray(env), is_constant
    )
    return DeviceSky(
        mode=np.int32(int(sky.mode)),
        constant_color=np.asarray(sky.constant_color, np.float32),
        sun_dir=sun_dir,
        sun_strength=np.float32(sky.sun_strength),
        env_rows=env_to_rows(np.asarray(env)),
        env_h=np.int32(env.shape[0]),
        env_w=np.int32(env.shape[1]),
        env_alias_rows=alias_rows,
        env_cell_pdf=cell_pdf,
        env_ch=np.int32(ch),
        env_cw=np.int32(cw),
        env_nee_total=np.float32(nee_total),
        env_spec_rows=env_to_rows_spec(env_spec),
        env_spec_h=np.int32(env_spec.shape[0]),
        env_spec_w=np.int32(env_spec.shape[1]),
        sun_disc_spec=sun_disc_spec,
        aerial_rows=aerial,
        sun_disc_radiance=sun_disc,
        geometry_offset=np.asarray(sky.geometry_offset, np.float32),
        moon_dir=sun_direction(sky.moon_azimuth, sky.moon_altitude),
        moon_tex_offset=np.float32(sky.moon_tex_offset),
        stars_seed=np.int32(sky.stars_seed),
        stars_count=np.int32(sky.stars_count),
        stars_intensity=np.float32(sky.stars_intensity),
    )


def _build_env_nee(env: np.ndarray, is_constant: bool):
    """Cell-grid importance distribution over the baked env map.

    Cells aggregate texel luminance x solid angle; sampling draws a cell via
    ONE alias-row gather and jitters uniformly inside it (piecewise-constant
    pdf — coarse is fine under MIS). Mirrors the role of the reference's
    HDRI importance data (sky_hdri.cuh) without a per-texel CDF walk.
    """
    from ..ops.lights import build_alias_table

    h, w = env.shape[0], env.shape[1]
    ch = int(min(64, max(h, 1)))
    cw = int(min(128, max(w, 1)))
    if is_constant or h < 4:
        return (np.zeros((1, 8), np.float32), np.zeros((1,), np.float32),
                1, 1, 0.0)
    lum = (0.2126 * env[..., 0] + 0.7152 * env[..., 1]
           + 0.0722 * env[..., 2]).astype(np.float64)
    # mean luminance per cell (block-reduce with edge-inclusive bins)
    ys = (np.arange(h) * ch // h).clip(0, ch - 1)
    xs = (np.arange(w) * cw // w).clip(0, cw - 1)
    cell_sum = np.zeros((ch, cw), np.float64)
    cell_cnt = np.zeros((ch, cw), np.float64)
    np.add.at(cell_sum, (ys[:, None], xs[None, :]),
              lum * np.ones((1, w)))
    np.add.at(cell_cnt, (ys[:, None], xs[None, :]), np.ones((h, w)))
    cell_mean = cell_sum / np.maximum(cell_cnt, 1.0)
    # cell solid angle: (2pi/cw) * (cos(theta_top) - cos(theta_bot))
    theta = np.linspace(0.0, np.pi, ch + 1)
    band = np.cos(theta[:-1]) - np.cos(theta[1:])
    omega = (2.0 * np.pi / cw) * band[:, None] * np.ones((1, cw))
    weight = (cell_mean * omega).reshape(-1)
    total = float(weight.sum())
    if total <= 0.0:
        return (np.zeros((1, 8), np.float32), np.zeros((1,), np.float32),
                1, 1, 0.0)
    p_cell = weight / total
    pdf_sr = (p_cell / np.maximum(omega.reshape(-1), 1e-12)).astype(np.float32)
    prob, alias = build_alias_table(weight)
    k = weight.shape[0]
    rows = np.zeros((k, 8), np.float32)
    rows[:, 0] = prob
    rows[:, 1] = np.arange(k, dtype=np.int32).view(np.float32)
    rows[:, 2] = pdf_sr
    rows[:, 3] = alias.astype(np.int32).view(np.float32)
    rows[:, 4] = pdf_sr[alias]
    return rows, pdf_sr, ch, cw, total


def flatten_instances(scene: Scene):
    """World-space triangle soup over all active instances (numpy).

    Returns (corners [T,3,3], normals [T,3,3], uvs [T,3,2], mat [T],
    inst [T], prim [T]).
    """
    corners_l, normals_l, uvs_l, mats_l, insts_l, prims_l = [], [], [], [], [], []
    # Mesh-local material ids were offset at scene-append time (host does the
    # remap); here they are already global.
    for inst in scene.instances:
        if not inst.active or inst.mesh_id >= len(scene.meshes):
            continue
        mesh = scene.meshes[inst.mesh_id]
        if mesh.num_triangles == 0:
            continue
        rot = _euler_to_matrix(inst.rotation)
        scale = np.asarray(inst.scale, np.float32)
        pos = np.asarray(inst.position, np.float32)
        c = mesh.corner_positions() * scale  # [T,3,3]
        c = c @ rot.T + pos
        # Normals: rotate; undo non-uniform scale via inverse scale then
        # normalize (inverse-transpose of diag(scale) @ rot).
        n = mesh.normals / np.maximum(scale, 1e-20)
        n = n @ rot.T
        n_len = np.linalg.norm(n, axis=-1, keepdims=True)
        n = n / np.maximum(n_len, 1e-20)
        corners_l.append(c.astype(np.float32))
        normals_l.append(n.astype(np.float32))
        uvs_l.append(mesh.uvs)
        mats_l.append(mesh.material_ids.astype(np.int32))
        insts_l.append(np.full(mesh.num_triangles, inst.id, np.int32))
        prims_l.append(np.arange(mesh.num_triangles, dtype=np.int32))

    # Procedural geometry: the (opt-in) tessellated ocean. Particles live
    # in their OWN tiled BVH (pack_particles_device) and the analytic ocean
    # in the integrator tier (ops/ocean.py).
    from ..ops.procedural import (
        OCEAN_INSTANCE_ID,
        generate_ocean_mesh,
    )

    proc_mat = len(scene.materials) if scene.materials else 1
    if scene.ocean.active:
        # analytic (default) oceans intersect in the integrator
        # (ops/ocean.py) — only the tessellated opt-in emits geometry, but
        # the material id is reserved either way (ocean_mat_id)
        if getattr(scene.ocean, "tessellated", False):
            oc_c, oc_n = generate_ocean_mesh(
                scene.ocean,
                center_xz=(scene.camera.pos[0], scene.camera.pos[2]),
            )
            t_o = oc_c.shape[0]
            corners_l.append(oc_c)
            normals_l.append(oc_n)
            uvs_l.append(np.zeros((t_o, 3, 2), np.float32))
            mats_l.append(np.full(t_o, proc_mat, np.int32))
            insts_l.append(np.full(t_o, OCEAN_INSTANCE_ID, np.int32))
            prims_l.append(np.arange(t_o, dtype=np.int32))
        proc_mat += 1

    if not corners_l:
        return (
            np.zeros((0, 3, 3), np.float32),
            np.zeros((0, 3, 3), np.float32),
            np.zeros((0, 3, 2), np.float32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
        )
    return (
        np.concatenate(corners_l),
        np.concatenate(normals_l),
        np.concatenate(uvs_l),
        np.concatenate(mats_l),
        np.concatenate(insts_l),
        np.concatenate(prims_l),
    )


def _cutout_micro_alpha(scene, mat_list, base_a, mat_slot, slot_uv,
                        slot_alpha) -> np.ndarray:
    """[P, 64] u8 micro-alpha grid for cutout slots (reference:
    device_omm.c / micromap.cuh microtriangle states — see pack_device_bvh
    for the state→mean-alpha re-design rationale).

    Each cutout triangle's barycentric domain is divided into an 8x8
    (u, v) cell grid; each cell stores the mean albedo-texture alpha over
    a 2x2 sample stencil inside the cell (clamped to the u+v<=1 triangle),
    times the material base alpha. Untextured cutouts get their uniform
    base alpha.
    """
    P = mat_slot.shape[0]
    grid = np.zeros((P, 64), np.uint16)
    cut = np.nonzero(slot_alpha < 1.0)[0]
    if cut.size == 0:
        return grid
    G, K = 8, 2
    # barycentric sample points per cell: [64, K*K] for u and v
    cell_s, cell_t = np.meshgrid(np.arange(G), np.arange(G), indexing="xy")
    cell_s = cell_s.reshape(-1)  # cell = t*8 + s ordering (trace side)
    cell_t = cell_t.reshape(-1)
    off = (np.arange(K) + 0.5) / K
    oi, oj = np.meshgrid(off, off, indexing="ij")
    su = (cell_s[:, None] + oi.reshape(-1)[None, :]) / G  # [64, K²]
    sv = (cell_t[:, None] + oj.reshape(-1)[None, :]) / G
    # clamp into the barycentric triangle (diagonal cells sample the edge)
    sv = np.minimum(sv, np.maximum(1.0 - su - 1e-4, 0.0))
    sw = 1.0 - su - sv

    mat_of = np.clip(mat_slot[cut], 0, len(mat_list) - 1)
    base = base_a[mat_of]
    tex_of = np.asarray([
        int(mat_list[m].albedo_tex) if mat_list[m].albedo_tex != TEXTURE_NONE
        else -1
        for m in mat_of
    ])
    # default: uniform base alpha
    grid[cut] = np.clip(
        np.rint(base[:, None] * 65535.0), 0.0, 65535.0).astype(np.uint16)
    for tid in np.unique(tex_of):
        if tid < 0 or tid >= len(scene.textures):
            continue
        img = scene.textures[int(tid)].as_float()
        if img.ndim != 3 or img.shape[-1] != 4:
            continue
        rows = np.nonzero(tex_of == tid)[0]
        sids = cut[rows]
        uv = slot_uv[sids]  # [R, 3, 2]
        # texture uv at each barycentric sample: w·uv0 + u·uv1 + v·uv2
        tu = (uv[:, None, None, 0, 0] * sw[None]
              + uv[:, None, None, 1, 0] * su[None]
              + uv[:, None, None, 2, 0] * sv[None])
        tv_ = (uv[:, None, None, 0, 1] * sw[None]
               + uv[:, None, None, 1, 1] * su[None]
               + uv[:, None, None, 2, 1] * sv[None])
        h, w = img.shape[0], img.shape[1]
        xi = np.clip(((tu % 1.0) * w).astype(np.int64), 0, w - 1)
        yi = np.clip(((tv_ % 1.0) * h).astype(np.int64), 0, h - 1)
        a = img[yi, xi, 3]  # [R, 64, K²]
        cellmean = a.mean(axis=2) * base[rows][:, None]
        grid[sids] = np.clip(
            np.rint(cellmean * 65535.0), 0.0, 65535.0).astype(np.uint16)
    return grid


def pack_particles_device(particles) -> "DeviceParticles | None":
    """Quad soup → tile-space BVH (see DeviceParticles)."""
    if not particles.active or int(particles.count) <= 0:
        return None
    from ..ops.procedural import generate_particles

    corners, _normals = generate_particles(particles)
    from ..bvh.native import build_bvh_native, build_wide_native

    wide = build_wide_native(corners)
    if wide is None:
        bvh2 = build_bvh_native(corners, leaf_size=LEAF_SIZE)
        if bvh2 is None:
            bvh2 = build_bvh(corners, leaf_size=LEAF_SIZE)
        wide = collapse_bvh8(bvh2)
    order = wide.tri_order
    valid = order >= 0
    safe = np.where(valid, order, 0)
    c = corners[safe].copy()
    c[~valid] = 0.0
    v0 = c[:, 0]
    e1 = c[:, 1] - c[:, 0]
    e2 = c[:, 2] - c[:, 0]
    v0[~valid] = 0.0
    e1[~valid] = 0.0
    e2[~valid] = 0.0
    motion = sun_direction(
        float(particles.direction_azimuth), float(particles.direction_altitude)
    ) * np.float32(particles.speed)
    return DeviceParticles(
        bvh=pack_device_bvh(wide, v0, e1, e2),
        scale=np.float32(max(float(particles.scale), 1e-6)),
        motion=motion.astype(np.float32),
        albedo=np.asarray(particles.albedo, np.float32),
    )


def pack_geometry(scene: Scene, topo=None) -> DeviceSceneGeo:
    """Build (or refit) the device geometry.

    topo: a cached WideBVH topology from a previous pack over the SAME
    triangle set. When the flatten produces the same triangle count, the
    tree is REFIT to the moved geometry instead of rebuilt — instance
    transform edits then cost milliseconds, the role of the reference's
    IAS update with GAS caching (optix_bvh.c:1-684). The caller caches the
    topology via ``pack_geometry.last_wide``.
    """
    corners, normals, uvs, mats, insts, prims = flatten_instances(scene)
    t = corners.shape[0]
    wide = None
    if topo is not None and int((topo.tri_order >= 0).sum()) == t:
        from ..bvh.wide import refit_wide

        wide = topo
        refit = True
    else:
        from ..bvh.native import build_bvh_native, build_wide_native

        # Preferred: the one-pass native wide build (quality collapse —
        # flattened small subtrees, pooled full leaf blocks). Fallback:
        # numpy BVH2 + greedy python collapse.
        wide = build_wide_native(corners)
        if wide is None:
            bvh2 = build_bvh_native(corners, leaf_size=LEAF_SIZE)
            if bvh2 is None:
                bvh2 = build_bvh(corners, leaf_size=LEAF_SIZE)
            wide = collapse_bvh8(bvh2)
        refit = False
        info_message(
            "BVH8 built: %d tris, %d wide nodes, %d leaf blocks, depth %d",
            t, wide.num_nodes, wide.num_blocks, wide.depth,
        )

    order = wide.tri_order  # [P] original tri id, -1 padding
    p = order.shape[0]
    valid = order >= 0
    safe = np.where(valid, order, 0)

    def slotify(arr, pad_value=0.0):
        out = arr[safe].copy()
        out[~valid] = pad_value
        return out

    c = slotify(corners) if t else np.zeros((p, 3, 3), np.float32)
    v0 = c[:, 0]
    e1 = c[:, 1] - c[:, 0]
    e2 = c[:, 2] - c[:, 0]
    # Padding slots: degenerate (e1=e2=0) triangles can never be hit.
    v0[~valid] = 0.0
    e1[~valid] = 0.0
    e2[~valid] = 0.0
    if refit:
        from ..bvh.wide import refit_wide

        wide = refit_wide(wide, v0, e1, e2)
    pack_geometry.last_wide = wide

    fn = np.cross(e1, e2)
    fn_len = np.linalg.norm(fn, axis=-1, keepdims=True)
    fn = fn / np.maximum(fn_len, 1e-20)

    slot_n = slotify(normals) if t else np.zeros((p, 3, 3), np.float32)
    slot_uv = slotify(uvs) if t else np.zeros((p, 3, 2), np.float32)

    def v3(a):
        return Vec3(
            np.ascontiguousarray(a[..., 0]),
            np.ascontiguousarray(a[..., 1]),
            np.ascontiguousarray(a[..., 2]),
        )

    # Per-slot opacity: material base alpha × mean albedo-texture alpha.
    # Slots below 1.0 are cutout triangles (alpha-test shadows; reference:
    # optix_anyhit.cuh / device_omm.c — see pack_device_bvh).
    mat_list = (scene.materials or []) + procedural_materials(scene)
    slot_alpha = slot_cut_grid = None
    if mat_list:
        base_a = np.asarray([m.albedo[3] for m in mat_list], np.float32)
        tex_a = np.ones(len(mat_list), np.float32)
        for i, m in enumerate(mat_list):
            tid = m.albedo_tex
            if tid != TEXTURE_NONE and 0 <= int(tid) < len(scene.textures):
                img = scene.textures[int(tid)].as_float()
                if img.ndim == 3 and img.shape[-1] == 4:
                    tex_a[i] = float(img[..., 3].mean())
        alpha_per_mat = np.clip(base_a * tex_a, 0.0, 1.0)
        if (alpha_per_mat < 1.0).any():
            mat_slot = np.where(valid, mats[safe] if t else 0, 0).astype(np.int64)
            slot_alpha = alpha_per_mat[
                np.clip(mat_slot, 0, len(mat_list) - 1)
            ].astype(np.float32)
            slot_alpha[~valid] = 1.0
            slot_cut_grid = _cutout_micro_alpha(
                scene, mat_list, base_a, mat_slot, slot_uv, slot_alpha)

    # numpy leaves: the caller ships the whole pytree to the device with a
    # single blob transfer (utils/fastput.py).
    return DeviceSceneGeo(
        bvh=pack_device_bvh(wide, v0, e1, e2, slot_alpha=slot_alpha,
                            slot_cut_grid=slot_cut_grid),
        n0=v3(slot_n[:, 0]),
        n1=v3(slot_n[:, 1]),
        n2=v3(slot_n[:, 2]),
        uv_u=Vec3(slot_uv[:, 0, 0].copy(), slot_uv[:, 1, 0].copy(), slot_uv[:, 2, 0].copy()),
        uv_v=Vec3(slot_uv[:, 0, 1].copy(), slot_uv[:, 1, 1].copy(), slot_uv[:, 2, 1].copy()),
        material_id=np.where(valid, mats[safe] if t else 0, 0).astype(np.int32),
        instance_id=np.where(valid, insts[safe] if t else 0, -1).astype(np.int32),
        prim_id=np.where(valid, prims[safe] if t else 0, -1).astype(np.int32),
        face_normal=v3(fn.astype(np.float32)),
    )


def _emission_tex_means(scene, geo, materials):
    """Per-slot emission-texture importance of textured emitters (reference:
    the GPU texture-emission integrator LIGHT_COMPUTE_INTENSITY,
    device_light.c:1952-2018 + light_microtriangle.cuh). Pack-time numpy:
    256 stratified points of the sqrt-warp domain per triangle, nearest-texel
    repeat-wrap fetch of the linear-float source. Returns (mean [P],
    cells [P, 16]) — the triangle's mean multiplier (selection importance)
    and per-cell weights of the 4x4 warp-domain grid (point importance,
    ops/lights.py micro sampling) — or (None, None) when no material uses a
    luminance map."""
    lum_tex = np.asarray(materials.luminance_tex)
    emissive = (np.asarray(materials.flags) & MAT_FLAG_EMISSIVE) != 0
    if not np.any(emissive & (lum_tex >= 0)):
        return None, None
    mat_ids = np.asarray(geo.material_id).astype(np.int64)
    tids = np.where(emissive[mat_ids], lum_tex[mat_ids], -1)
    valid = np.asarray(geo.prim_id) >= 0
    mult = np.ones(mat_ids.shape[0], np.float32)
    cells = np.ones((mat_ids.shape[0], 16), np.float32)

    # 16x16 stratified (r1, r2) grid; cell (i, j) = point block
    # [4i:4i+4, 4j:4j+4] — the runtime warps a uniform cell draw with
    # r1' = (i + u)/4 (ops/lights.py), so pack and sampler share the grid
    g = (np.arange(16, dtype=np.float64) + 0.5) / 16.0
    r1, r2 = np.meshgrid(g, g, indexing="ij")
    su = np.sqrt(r1.ravel())
    b1 = (1.0 - su).astype(np.float32)  # [256]
    b2 = (r2.ravel() * su).astype(np.float32)
    b0 = 1.0 - b1 - b2

    uu = np.stack([np.asarray(geo.uv_u.x), np.asarray(geo.uv_u.y),
                   np.asarray(geo.uv_u.z)], axis=-1)  # [P, 3]
    vv = np.stack([np.asarray(geo.uv_v.x), np.asarray(geo.uv_v.y),
                   np.asarray(geo.uv_v.z)], axis=-1)

    # 2D-page texture ids only (3D noise textures are skipped by the atlas)
    page_of = {}
    page = 0
    for i, tex in enumerate(scene.textures):
        if tex.as_float().ndim == 4:
            continue
        page_of[i] = page
        page += 1

    for tid in np.unique(tids[valid & (tids >= 0)]):
        if int(tid) not in page_of:
            continue
        f = scene.textures[int(tid)].as_float()
        if f.shape[-1] == 1:
            lum = f[..., 0]
        else:
            lum = (0.2126 * f[..., 0] + 0.7152 * f[..., 1]
                   + 0.0722 * f[..., 2])
        h, w = lum.shape[:2]
        sel = np.nonzero(valid & (tids == tid))[0]
        u = (uu[sel, 0:1] * b0[None] + uu[sel, 1:2] * b1[None]
             + uu[sel, 2:3] * b2[None])  # [S, 64]
        v = (vv[sel, 0:1] * b0[None] + vv[sel, 1:2] * b1[None]
             + vv[sel, 2:3] * b2[None])
        xi = np.clip(((u - np.floor(u)) * w).astype(np.int64), 0, w - 1)
        yi = np.clip(((v - np.floor(v)) * h).astype(np.int64), 0, h - 1)
        vals = lum[yi, xi].astype(np.float32)  # [S, 256]
        mean = vals.mean(axis=1)
        # floor: any emitter with a nonzero texel stays selectable (the
        # estimator is unbiased for any positive selection pdf)
        mult[sel] = np.maximum(mean, 1e-3)
        c = vals.reshape(-1, 4, 4, 4, 4).mean(axis=(2, 4))  # [S, 4, 4]
        c = c.reshape(-1, 16)
        # floor each cell at 2% of the row max: a bright texel the 16-point
        # cell estimate missed must still be reachable (pdf > 0 everywhere
        # Le might be > 0 — bias guard, not a variance choice)
        floor = 0.02 * c.max(axis=1, keepdims=True) + 1e-6
        cells[sel] = np.maximum(c, floor)
    return mult, cells


def pack_lights_for(geo: DeviceSceneGeo, materials: DeviceMaterials,
                    scene=None):
    """Emissive-triangle light set over the packed geometry (reference:
    device_light.c build, here alias-table based — see ops/lights.py).
    scene: when given, textured emitters weight their selection importance
    by the luminance map's triangle mean (_emission_tex_means)."""
    from ..ops.lights import pack_lights

    def arr3(v):
        return np.stack(
            [np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)], axis=-1
        )

    emission = np.stack(
        [
            np.asarray(materials.emission_r),
            np.asarray(materials.emission_g),
            np.asarray(materials.emission_b),
        ],
        axis=-1,
    )
    tex_lum_mean, micro_w = (
        _emission_tex_means(scene, geo, materials) if scene is not None
        else (None, None)
    )
    return pack_lights(
        tri_v0=arr3(geo.bvh.tri_v0),
        tri_e1=arr3(geo.bvh.tri_e1),
        tri_e2=arr3(geo.bvh.tri_e2),
        material_id=np.asarray(geo.material_id),
        emission=emission,
        emissive_flags=(np.asarray(materials.flags) & MAT_FLAG_EMISSIVE) != 0,
        valid_slot=np.asarray(geo.prim_id) >= 0,
        tex_lum_mean=tex_lum_mean,
        micro_w=micro_w,
    )


def pack_scene(scene: Scene) -> DeviceScene:
    """Full scene pack (the 'upload dirty entities' path; reference:
    device_manager.c:281-513 does this incrementally — incrementality comes
    with the dirty-flag-driven renderer update)."""
    from ..ops.clouds import pack_clouds
    from ..ops.textures import pack_textures, page_resolutions
    from ..ops.volume import pack_fog, pack_water

    geo = pack_geometry(scene)
    materials = pack_materials(scene)
    lights = pack_lights_for(geo, materials, scene=scene)
    shade_hot, shade_aux, shade_micro = pack_shade_packed(
        geo, materials, lights,
        tex_res=page_resolutions(scene.textures))
    ds = DeviceScene(
        geo=geo,
        materials=materials,
        sky=pack_sky(scene),
        lights=lights,
        fog=pack_fog(scene.fog),
        water=pack_water(scene.ocean),
        textures=pack_textures(scene.textures),
        clouds=pack_clouds(scene.cloud),
        shade_hot=shade_hot,
        shade_aux=shade_aux,
        shade_micro=shade_micro,
        light_slot_rows=pack_light_slot_rows(geo, materials, lights),
    )
    from ..utils.fastput import fast_device_put

    return fast_device_put(ds)
