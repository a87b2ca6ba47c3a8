"""Golden-image regression gate.

The reference's de-facto integration test is the benchmark ladder + FLIP
comparison against stored reference images (comparison.py). This is the CI
version: small deterministic renders compared against goldens stored in
tests/golden/. A silent change to any estimator (BSDF sign, MIS weight, RNG
stream, NEE pdf) shifts the image beyond the gate.

Regenerate intentionally with:
    python tests/test_golden.py --regen
and justify the change in the commit message.
"""

import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SPP = 64


def _scenes():
    from luminary_tpu.scene.entities import Material, MaterialBaseSubstrate
    from luminary_tpu.scene.mesh import Mesh, Texture
    from luminary_tpu.testing import (
        _uv_sphere,
        cornell_scene,
        sun_plane_scene,
    )

    def glass_sphere():
        # refraction + 2-deep medium stack + sun/sky (VERDICT r2 golden gap)
        s = sun_plane_scene(32, 32)
        mid = s.add_material(Material(
            albedo=(1.0, 1.0, 1.0, 1.0), roughness=0.05,
            base_substrate=MaterialBaseSubstrate.TRANSLUCENT,
            refraction_index=1.5,
        ))
        v, t = _uv_sphere(0.0, 1.0, 0.0, 0.8)
        mesh = Mesh(vertices=v, triangles=t,
                    material_ids=np.full(len(t), mid, np.uint16),
                    name="glass")
        s.add_mesh(mesh)
        inst = s.new_instance()
        inst.mesh_id = mesh.id
        s.set_instance(inst)
        st = s.get_entity("settings")
        st.max_ray_depth = 5
        s.set_entity("settings", st)
        return s

    def textured():
        # 8x8 checker albedo texture on the sun plane (mip/bilinear path)
        s = sun_plane_scene(32, 32)
        c = np.zeros((64, 64, 4), np.uint8)
        cell = (np.arange(64) // 8)[:, None] + (np.arange(64) // 8)[None, :]
        c[..., 0] = np.where(cell % 2 == 0, 230, 30)
        c[..., 1] = np.where(cell % 2 == 0, 60, 200)
        c[..., 2] = 60
        c[..., 3] = 255
        tex_id = s.add_texture(Texture(data=c, gamma=2.2))
        m = s.get_material(0)
        m.albedo_tex = tex_id
        s.set_material(m)
        s.meshes[0].uvs = np.asarray(
            [[[0, 0], [4, 0], [4, 4]], [[0, 0], [4, 4], [0, 4]]],
            np.float32)
        return s

    def fog_bridges():
        # emissive panel in homogeneous fog → volume NEE + bridge estimator
        s = cornell_scene(32, 32, max_depth=4)
        fog = s.get_entity("fog")
        fog.active = True
        fog.density = 0.35
        s.set_entity("fog", fog)
        return s

    def emitter_field():
        # 98 emitters → the 16-wide light tree drives RIS candidate 0
        from test_lights import _emitter_field_scene

        return _emitter_field_scene(width=32, height=32, n_emit=7, ris_k=4)

    def clouds():
        s = sun_plane_scene(32, 32)
        cl = s.get_entity("cloud")
        cl.active = True
        cl.low.active = True
        s.set_entity("cloud", cl)
        return s

    # cornell: GGX + area-light NEE + MIS; sun_plane: sun NEE + env sky
    return {
        "cornell_32": cornell_scene(32, 32, max_depth=4),
        "sun_plane_32": sun_plane_scene(32, 32),
        "glass_sphere_32": glass_sphere(),
        "textured_32": textured(),
        "fog_bridges_32": fog_bridges(),
        "emitter_field_32": emitter_field(),
        "clouds_32": clouds(),
    }


def _render(scene):
    from luminary_tpu.render.renderer import Renderer

    r = Renderer(scene, chunk=1 << 20)
    r.render_samples(SPP)
    n = scene.settings.width * scene.settings.height
    img = (
        np.asarray(r.accum.radiance)[:n]
        / np.asarray(r.accum.sample_count)[:n, None]
    )
    return img.reshape(scene.settings.height, scene.settings.width, 3)


def test_renders_match_goldens():
    from luminary_tpu.tools.compare import rel_mse, rmse

    for name, scene in _scenes().items():
        path = os.path.join(GOLDEN_DIR, f"{name}_{SPP}spp.npy")
        assert os.path.exists(path), (
            f"golden missing: {path} — run python tests/test_golden.py --regen"
        )
        ref = np.load(path).astype(np.float32)
        img = _render(scene)
        r = rmse(img, ref)
        rm = rel_mse(img, ref)
        scale = float(np.abs(ref).mean()) + 1e-6
        # identical RNG streams → only float-reassociation noise expected
        assert r / scale < 0.02, (name, r, scale, rm)


def test_render_is_deterministic():
    name, scene = next(iter(_scenes().items()))
    a = _render(scene)
    b = _render(_scenes()[name])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, scene in _scenes().items():
            img = _render(scene)
            # f32: f16 loses ~5e-4 relative on firefly pixels, which alone
            # breaks a 2% RMSE gate on a 32x32 image
            np.save(os.path.join(GOLDEN_DIR, f"{name}_{SPP}spp.npy"),
                    img.astype(np.float32))
            print("wrote", name, img.mean())
