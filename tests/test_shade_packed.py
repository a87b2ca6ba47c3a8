"""Packed shade-table round-trip: pack_shade_packed quantization must
reproduce the source per-slot fields within its stated tolerances
(device_scene.py SHP_*/SHA_* maps; reference analog: the 32-B material /
64-B triangle compression of device_structs.h:214-281)."""

import numpy as np
import jax.numpy as jnp

import pytest

from luminary_tpu.render.device_scene import (
    SHA_E1XY,
    SHA_LOD,
    SHA_TEX_AR,
    SHA_TEX_L_ABBE,
    SHA_TEX_MN,
    SHA_UV0,
    SHP_ALB_RG,
    SHP_AREA,
    SHP_EM_B_ROUGH,
    SHP_FACE,
    SHP_FLAGS,
    SHP_IDS,
    SHP_METAL_IOR,
    SHP_N0,
    SHP_SEL_PDF,
    SHP_SUB,
    pack_geometry,
    pack_lights_for,
    pack_materials,
    pack_shade_packed,
    shp_col,
    unpack_f16_pair,
    unpack_i16_pair,
    unpack_oct_snorm16,
)


@pytest.fixture(scope="module")
def packed():
    from luminary_tpu.testing import benchmark_scene

    scene = benchmark_scene(32, 32, max_depth=2, nx=3, nz=3)
    geo = pack_geometry(scene)
    materials = pack_materials(scene)
    lights = pack_lights_for(geo, materials, scene=scene)
    hot, aux, micro = pack_shade_packed(geo, materials, lights)
    return scene, geo, materials, lights, hot, aux, micro


def _cols(hot, slots, c):
    planar = jnp.asarray(hot[np.asarray(slots) >> 3].T)  # [128, K]
    sub = jnp.asarray(np.asarray(slots) & (SHP_SUB - 1))
    return shp_col(planar, sub, c)


def test_hot_roundtrip(packed):
    scene, geo, materials, lights, hot, aux, micro = packed
    p = np.asarray(geo.material_id).shape[0]
    rng = np.random.default_rng(0)
    slots = rng.integers(0, p, 257).astype(np.int32)

    # normals: oct snorm16, < ~1e-4 component error
    nx, ny, nz = (np.asarray(a) for a in
                  unpack_oct_snorm16(_cols(hot, slots, SHP_N0)))
    ref = np.stack([np.asarray(geo.n0.x), np.asarray(geo.n0.y),
                    np.asarray(geo.n0.z)], -1)[slots]
    got = np.stack([nx, ny, nz], -1)
    ln = np.linalg.norm(ref, axis=-1)
    ok = ln > 1e-6  # zero rows (padding slots) decode arbitrarily
    assert np.abs(got[ok] - ref[ok] / ln[ok, None]).max() < 2e-4

    fx, fy, fz = (np.asarray(a) for a in
                  unpack_oct_snorm16(_cols(hot, slots, SHP_FACE)))
    reff = np.stack([np.asarray(geo.face_normal.x),
                     np.asarray(geo.face_normal.y),
                     np.asarray(geo.face_normal.z)], -1)[slots]
    lnf = np.linalg.norm(reff, axis=-1)
    okf = lnf > 1e-6
    assert np.abs(np.stack([fx, fy, fz], -1)[okf]
                  - reff[okf] / lnf[okf, None]).max() < 2e-4

    # ids exact
    ids = np.asarray(_cols(hot, slots, SHP_IDS))
    assert ((ids & 0xFFFF) == np.asarray(geo.material_id)[slots]).all()
    assert (((ids >> 16) & 0xFFFF) - 1
            == np.asarray(geo.instance_id)[slots]).all()

    # material scalars: f16 (<= 1e-3 relative)
    m = np.asarray(geo.material_id)[slots]
    alb_r, alb_g = (np.asarray(a) for a in
                    unpack_f16_pair(_cols(hot, slots, SHP_ALB_RG)))
    np.testing.assert_allclose(
        alb_r, np.asarray(materials.albedo_r)[m], rtol=1e-3, atol=1e-4)
    em_b, rough = (np.asarray(a) for a in
                   unpack_f16_pair(_cols(hot, slots, SHP_EM_B_ROUGH)))
    np.testing.assert_allclose(
        rough, np.asarray(materials.roughness)[m], rtol=1e-3, atol=1e-4)
    metal, ior = (np.asarray(a) for a in
                  unpack_f16_pair(_cols(hot, slots, SHP_METAL_IOR)))
    np.testing.assert_allclose(
        ior, np.asarray(materials.ior)[m], rtol=1e-3, atol=1e-4)

    # flags exact
    flags = np.asarray(_cols(hot, slots, SHP_FLAGS)).view(np.uint32)
    assert (flags == np.asarray(materials.flags)[m].astype(np.uint32)).all()

    # MIS-critical pdf fields: BIT-exact f32
    sel = np.asarray(_cols(hot, slots, SHP_SEL_PDF)).view(np.float32)
    assert (sel == np.asarray(lights.slot_select_pdf)[slots]).all()
    area = np.asarray(_cols(hot, slots, SHP_AREA)).view(np.float32)
    assert (area == np.asarray(lights.slot_area)[slots]).all()


def test_aux_roundtrip(packed):
    scene, geo, materials, lights, hot, aux, micro = packed
    p = np.asarray(geo.material_id).shape[0]
    rng = np.random.default_rng(1)
    slots = rng.integers(0, p, 257).astype(np.int32)
    m = np.asarray(geo.material_id)[slots]

    u0, v0 = (np.asarray(a) for a in
              unpack_f16_pair(_cols(aux, slots, SHA_UV0)))
    np.testing.assert_allclose(
        u0, np.asarray(geo.uv_u.x)[slots], rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(
        v0, np.asarray(geo.uv_v.x)[slots], rtol=1e-3, atol=5e-4)

    at, rt = (np.asarray(a) for a in
              unpack_i16_pair(_cols(aux, slots, SHA_TEX_AR)))
    assert (at == np.asarray(materials.albedo_tex)[m]).all()
    assert (rt == np.asarray(materials.roughness_tex)[m]).all()
    mt, nt = (np.asarray(a) for a in
              unpack_i16_pair(_cols(aux, slots, SHA_TEX_MN)))
    assert (mt == np.asarray(materials.metallic_tex)[m]).all()
    assert (nt == np.asarray(materials.normal_tex)[m]).all()
    lt, _ = (np.asarray(a) for a in
             unpack_i16_pair(_cols(aux, slots, SHA_TEX_L_ABBE)))
    assert (lt == np.asarray(materials.luminance_tex)[m]).all()
    _, abbe = (np.asarray(a) for a in
               unpack_f16_pair(_cols(aux, slots, SHA_TEX_L_ABBE)))
    np.testing.assert_allclose(
        abbe, np.asarray(materials.abbe)[m], rtol=1e-3, atol=0.05)

    lod = np.asarray(_cols(aux, slots, SHA_LOD)).view(np.float32)
    assert np.isfinite(lod).all()

    e1x, e1y = (np.asarray(a) for a in
                unpack_f16_pair(_cols(aux, slots, SHA_E1XY)))
    np.testing.assert_allclose(
        e1x, np.asarray(geo.bvh.tri_e1.x)[slots], rtol=1e-3, atol=1e-3)


def test_rows_path_matches_small_path_radiance():
    """The quantized rows path must agree with the exact small-table path
    on the same scene to quantization tolerance. The threshold is forced
    via SMALL_TABLE_SLOTS monkeypatching."""
    import luminary_tpu.render.wavefront as wf
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.testing import benchmark_scene

    def render():
        scene = benchmark_scene(width=32, height=24, max_depth=2, nx=3, nz=3)
        r = Renderer(scene, chunk=1 << 20)
        r.render_samples(1)
        return (np.asarray(r.accum.radiance)
                / np.asarray(r.accum.sample_count)[:, None])

    old = wf.SMALL_TABLE_SLOTS
    try:
        wf.SMALL_TABLE_SLOTS = 1 << 30  # everything takes the small path
        a = render()
    finally:
        wf.SMALL_TABLE_SLOTS = old
    b = render()  # ~2.5k slots > 2048: rows path
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # quantized normals/materials shift radiance slightly; mean must agree
    # tightly and per-pixel error stay small relative to the image scale
    scale = max(float(np.abs(a).mean()), 1e-6)
    assert abs(a.mean() - b.mean()) / scale < 0.01, (a.mean(), b.mean())
    assert np.abs(a - b).max() / max(float(np.abs(a).max()), 1e-6) < 0.05
