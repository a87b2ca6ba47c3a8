"""Many-light sampling: RIS reservoir resampling over alias candidates.

Reference behavior targets: cuda/ris.cuh (standard reservoir), light.cuh
resampled candidates. The contract tested here: RIS with K candidates is
(a) unbiased — same converged mean as 1-candidate NEE — and (b) lower
variance on a many-emitter scene.
"""

import numpy as np
import pytest

from luminary_tpu.scene.entities import Material, SkyMode
from luminary_tpu.scene.mesh import Mesh
from luminary_tpu.scene.scene import Scene


def _emitter_field_scene(width=32, height=32, n_emit=7, ris_k=1):
    """Diffuse floor lit by a grid of small emissive quads of very unequal
    power — the regime where power-only 1-candidate selection is noisy."""
    scene = Scene()
    scene.add_material(Material(albedo=(0.7, 0.7, 0.7, 1.0), roughness=1.0))

    verts = [(-8, 0, -8), (8, 0, -8), (8, 0, 8), (-8, 0, 8)]
    tris = [[0, 1, 2], [0, 2, 3]]
    mat_ids = [0, 0]
    rng = np.random.default_rng(3)
    for i in range(n_emit):
        for j in range(n_emit):
            mid = len(scene.materials)
            power = float(rng.uniform(0.5, 40.0))
            scene.add_material(
                Material(
                    albedo=(0, 0, 0, 1),
                    emission=(power, power * 0.9, power * 0.7),
                    emission_active=True,
                )
            )
            cx = -6 + 12 * i / max(n_emit - 1, 1)
            cz = -6 + 12 * j / max(n_emit - 1, 1)
            s = 0.25
            base = len(verts)
            # wound so the face normal points DOWN at the floor
            verts += [
                (cx - s, 3.0, cz - s), (cx + s, 3.0, cz - s),
                (cx + s, 3.0, cz + s), (cx - s, 3.0, cz + s),
            ]
            tris += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
            mat_ids += [mid, mid]

    mesh = Mesh(
        vertices=np.asarray(verts, np.float32),
        triangles=np.asarray(tris, np.int32),
        material_ids=np.asarray(mat_ids, np.uint16),
        name="emitter_field",
    )
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)

    settings = scene.get_entity("settings")
    settings.width = width
    settings.height = height
    settings.max_ray_depth = 2
    settings.light_ris_candidates = ris_k
    scene.set_entity("settings", settings)

    cam = scene.get_entity("camera")
    cam.pos = (0.0, 5.0, 0.0)
    cam.rotation = (-np.pi / 2, 0.0, 0.0)  # straight down at the floor
    scene.set_entity("camera", cam)

    sky = scene.get_entity("sky")
    sky.mode = SkyMode.CONSTANT_COLOR
    sky.constant_color = (0.0, 0.0, 0.0)
    scene.set_entity("sky", sky)
    return scene


def _render_stats(ris_k, samples=48, n_emit=5):
    from luminary_tpu.render.renderer import Renderer

    r = Renderer(_emitter_field_scene(ris_k=ris_k, n_emit=n_emit), chunk=1 << 20)
    r.render_samples(samples)
    acc = r.accum
    n = np.asarray(acc.sample_count, np.float64)
    mean_rgb = np.asarray(acc.radiance, np.float64) / n[:, None]
    lum = (
        0.2126 * np.asarray(acc.radiance[:, 0], np.float64)
        + 0.7152 * np.asarray(acc.radiance[:, 1], np.float64)
        + 0.0722 * np.asarray(acc.radiance[:, 2], np.float64)
    ) / n
    # per-pixel sample variance from the luminance second moment
    e2 = np.asarray(acc.lum_sq, np.float64) / n
    var = np.maximum(e2 - lum * lum, 0.0)
    return mean_rgb, float(np.mean(var)), float(np.mean(lum))


def test_ris_reduces_variance_unbiased():
    # n_emit=5 → 50 emissive tris < LIGHT_TREE_MIN_LIGHTS: pure alias + RIS
    mean1, var1, lum1 = _render_stats(ris_k=1)
    mean8, var8, lum8 = _render_stats(ris_k=8)
    # (a) unbiased: the two converge to the same image
    assert abs(lum8 - lum1) / max(lum1, 1e-9) < 0.05
    # (b) many unequal emitters: 8-candidate RIS cuts variance well below
    # the 1-candidate estimator (measured ~1.5x with the cheap geometric
    # target; require 1.3x to keep the gate robust to sampling noise)
    assert var8 < var1 / 1.3, (var1, var8)


def test_light_tree_activates_and_stays_unbiased():
    # n_emit=7 → 98 emissive tris ≥ LIGHT_TREE_MIN_LIGHTS: candidates come
    # from tree descents. The image must match the alias-path estimate.
    from luminary_tpu.render.renderer import Renderer

    r = Renderer(_emitter_field_scene(ris_k=4, n_emit=7), chunk=1 << 20)
    assert r.device_scene.lights.tree_levels > 0
    mean_t, var_t, lum_t = _render_stats(ris_k=4, n_emit=7)
    import luminary_tpu.ops.light_tree as lt

    old = lt.LIGHT_TREE_MIN_LIGHTS
    lt.LIGHT_TREE_MIN_LIGHTS = 10**9  # force alias path
    try:
        mean_a, var_a, lum_a = _render_stats(ris_k=4, n_emit=7)
    finally:
        lt.LIGHT_TREE_MIN_LIGHTS = old
    assert abs(lum_t - lum_a) / max(lum_a, 1e-9) < 0.05
    # distance-aware candidates can't be (much) worse than power-only
    assert var_t < var_a * 1.1, (var_t, var_a)


def test_ris_k1_matches_legacy_single_candidate():
    """K=1 must degenerate exactly to plain 1-candidate NEE (W = 1/pdf)."""
    mean1, var1, _ = _render_stats(ris_k=1, samples=8)
    assert np.isfinite(mean1).all()
    assert (mean1 >= 0).all()


def test_textured_emitter_selection_importance():
    """Emission-texture microtriangle integration (reference:
    LIGHT_COMPUTE_INTENSITY, device_light.c:1952-2018): a textured emitter's
    selection probability scales with its luminance map's triangle mean."""
    from luminary_tpu.render.device_scene import (
        pack_geometry, pack_lights_for, pack_materials,
    )
    from luminary_tpu.scene.mesh import Texture

    def build(with_textures):
        scene = Scene()
        scene.add_material(Material(albedo=(0.7, 0.7, 0.7, 1.0)))
        # two identical emitter quads, same material emission
        verts, tris, mids = [], [], []
        for k in range(2):
            mid = len(scene.materials)
            mat = Material(albedo=(0, 0, 0, 1), emission=(10, 10, 10),
                           emission_active=True)
            scene.add_material(mat)
            base = len(verts)
            x = -2.0 + 4.0 * k
            verts += [(x, 3, -1), (x + 1, 3, -1), (x + 1, 3, 1), (x, 3, 1)]
            tris += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
            mids += [mid, mid]
        mesh = Mesh(
            vertices=np.asarray(verts, np.float32),
            triangles=np.asarray(tris, np.int32),
            material_ids=np.asarray(mids, np.uint16),
        )
        mesh.uvs = np.asarray(
            [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]] * 2,
            np.float32)
        scene.add_mesh(mesh)
        inst = scene.new_instance()
        inst.mesh_id = mesh.id
        scene.set_instance(inst)
        if with_textures:
            # emitter 0: luminance map ~12.5% lit; emitter 1: fully lit
            res = 64
            dark = np.zeros((res, res, 3), np.uint8)
            dark[: res // 8] = 255
            tid0 = scene.add_texture(Texture(data=dark, gamma=1.0))
            tid1 = scene.add_texture(
                Texture(data=np.full((res, res, 3), 255, np.uint8),
                        gamma=1.0))
            m0 = scene.get_material(1)
            m0.luminance_tex = tid0
            scene.set_material(m0)
            m1 = scene.get_material(2)
            m1.luminance_tex = tid1
            scene.set_material(m1)
        geo = pack_geometry(scene)
        mats = pack_materials(scene)
        return pack_lights_for(geo, mats, scene=scene)

    plain = build(False)
    tex = build(True)
    # untextured: equal quads, equal selection
    sp = np.asarray(plain.select_pdf)
    assert np.allclose(sp, sp[0])
    # textured: the dark emitter's triangles get ~1/8 the bright one's pdf
    st = np.asarray(tex.select_pdf)
    ratio = st[:2].mean() / st[2:].mean()
    assert 0.08 < ratio < 0.2, ratio
    # pdfs still sum to 1
    assert abs(st.sum() - 1.0) < 1e-5


def _striped_emitter_scene(res=16):
    """Floor lit by one emitter quad whose luminance map is a bright 1/8
    stripe — uniform point sampling wastes 7/8 of its NEE rays on Le=0."""
    from luminary_tpu.scene.mesh import Texture

    scene = Scene()
    scene.add_material(Material(albedo=(0.7, 0.7, 0.7, 1.0), roughness=1.0))
    mid = len(scene.materials)
    scene.add_material(Material(albedo=(0, 0, 0, 1), emission=(40, 40, 40),
                                emission_active=True))
    verts = [(-8, 0, -8), (8, 0, -8), (8, 0, 8), (-8, 0, 8),
             (-2, 4, -2), (2, 4, -2), (2, 4, 2), (-2, 4, 2)]
    tris = [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]]
    mids = [0, 0, mid, mid]
    mesh = Mesh(
        vertices=np.asarray(verts, np.float32),
        triangles=np.asarray(tris, np.int32),
        material_ids=np.asarray(mids, np.uint16),
    )
    mesh.uvs = np.asarray(
        [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]] * 2, np.float32)
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)
    tex = np.zeros((64, 64, 3), np.uint8)
    tex[:8] = 255
    tid = scene.add_texture(Texture(data=tex, gamma=1.0))
    m = scene.get_material(mid)
    m.luminance_tex = tid
    scene.set_material(m)
    st = scene.get_entity("settings")
    st.max_ray_depth = 2
    st.width = st.height = res
    scene.set_entity("settings", st)
    cam = scene.get_entity("camera")
    cam.pos = (0.0, 2.5, 7.0)  # camera space looks down -Z → at the floor
    scene.set_entity("camera", cam)
    sky = scene.get_entity("sky")
    sky.mode = SkyMode.CONSTANT_COLOR
    sky.constant_color = (0.0, 0.0, 0.0)  # the emitter is the only light
    scene.set_entity("sky", sky)
    return scene


def test_micro_point_sampling_reduces_variance_unbiased(monkeypatch):
    """Emission-texture point importance (reference: light_microtriangle.cuh)
    must cut NEE variance on a sparse-texture emitter without moving the
    converged mean."""
    from luminary_tpu.render.renderer import Renderer
    import luminary_tpu.render.device_scene as ds

    res, spp = 16, 96

    def run(disable):
        if disable:
            monkeypatch.setattr(ds, "_emission_tex_means",
                                lambda *a: (None, None))
        else:
            monkeypatch.undo()
        r = Renderer(_striped_emitter_scene(res), chunk=res * res)
        assert r.device_scene.lights.has_micro == (not disable)
        r.render_samples(spp)
        rad = r.get_radiance()
        lsq = np.asarray(r.accum.lum_sq)[: res * res] / spp
        lum = (0.2126 * rad[..., 0] + 0.7152 * rad[..., 1]
               + 0.0722 * rad[..., 2]).reshape(-1)
        var = np.maximum(lsq - lum * lum, 0.0).reshape(res, res)
        # the metric region is the FLOOR (bottom rows): the emitter's own
        # silhouette pixels carry huge binary antialiasing variance that no
        # light sampler can touch
        return rad, var[res // 2:, :]

    rad_u, var_u = run(disable=True)
    rad_m, var_m = run(disable=False)
    # same converged mean (unbiased)
    mu_u, mu_m = rad_u[res // 2:].mean(), rad_m[res // 2:].mean()
    assert abs(mu_m - mu_u) < 0.08 * max(mu_u, 1e-6), (mu_u, mu_m)
    # materially lower variance on the lit floor
    assert var_m.sum() < 0.6 * var_u.sum(), (var_m.sum(), var_u.sum())
