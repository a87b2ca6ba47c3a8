"""Environment-map NEE: unbiasedness + variance on a hot-spot HDRI.

Reference behavior target: direct_lighting.cuh ambient tasks +
sky_hdri.cuh importance sampling. Contract: with a small hot region in an
otherwise dim environment, ambient NEE must (a) converge to the same image
as pure BSDF sampling (MIS unbiased) and (b) cut variance by a large
factor (the VERDICT r2 gate asks for >= 5x on a hot-sun HDRI).
"""

import numpy as np

from luminary_tpu.scene.entities import Material, SkyMode
from luminary_tpu.scene.mesh import Mesh
from luminary_tpu.scene.scene import Scene


def _hotspot_scene(ambient_nee: bool, width=24, height=24):
    scene = Scene()
    scene.add_material(Material(albedo=(0.8, 0.8, 0.8, 1.0), roughness=1.0))
    verts = [(-8, 0, -8), (8, 0, -8), (8, 0, 8), (-8, 0, 8)]
    tris = [[0, 1, 2], [0, 2, 3]]
    mesh = Mesh(
        vertices=np.asarray(verts, np.float32),
        triangles=np.asarray(tris, np.int32),
        material_ids=np.zeros(2, np.uint16),
        name="floor",
    )
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)

    # dim environment with one ~30x30-texel hot patch above the horizon
    env = np.full((128, 256, 3), 0.02, np.float32)
    env[28:58, 60:90] = (120.0, 100.0, 80.0)
    sky = scene.get_entity("sky")
    sky.mode = SkyMode.HDRI
    scene.set_entity("sky", sky)
    scene.set_sky_hdri(env)

    settings = scene.get_entity("settings")
    settings.width = width
    settings.height = height
    settings.max_ray_depth = 2
    settings.light_ris_candidates = 1
    settings.ambient_nee = ambient_nee
    scene.set_entity("settings", settings)

    cam = scene.get_entity("camera")
    cam.pos = (0.0, 5.0, 0.0)
    cam.rotation = (-np.pi / 2, 0.0, 0.0)
    scene.set_entity("camera", cam)
    return scene


def _stats(ambient_nee, samples=64):
    from luminary_tpu.render.renderer import Renderer

    r = Renderer(_hotspot_scene(ambient_nee), chunk=1 << 20)
    assert r.config.env_nee == ambient_nee
    r.render_samples(samples)
    acc = r.accum
    n = np.asarray(acc.sample_count, np.float64)
    lum = (
        0.2126 * np.asarray(acc.radiance[:, 0], np.float64)
        + 0.7152 * np.asarray(acc.radiance[:, 1], np.float64)
        + 0.0722 * np.asarray(acc.radiance[:, 2], np.float64)
    ) / n
    e2 = np.asarray(acc.lum_sq, np.float64) / n
    var = np.maximum(e2 - lum * lum, 0.0)
    return float(np.mean(lum)), float(np.mean(var))


def test_env_nee_unbiased_and_lower_variance():
    lum_on, var_on = _stats(True)
    lum_off, var_off = _stats(False, samples=256)
    # (a) same converged mean (BSDF-only needs many samples to stabilize)
    assert abs(lum_on - lum_off) / max(lum_off, 1e-9) < 0.08, (
        lum_on, lum_off)
    # (b) a ~1% solid-angle hot patch: cosine sampling hits it rarely;
    # importance sampling should cut variance dramatically
    assert var_on < var_off / 5.0, (var_on, var_off)


def test_env_nee_default_sky_disabled():
    """DEFAULT (clear atmosphere) sky keeps ambient NEE OFF, matching the
    reference gate (direct_lighting.cuh:279 disallows ambient lighting for
    SKY_MODE_DEFAULT): the smooth sun-less atmosphere gains no variance
    from importance sampling and would cost a third shadow segment."""
    from luminary_tpu.render.renderer import Renderer

    s = _hotspot_scene(True)
    sky = s.get_entity("sky")
    sky.mode = SkyMode.DEFAULT
    sky.altitude = 0.7
    s.set_entity("sky", sky)
    r = Renderer(s, chunk=1 << 20)
    r.update()
    assert r.config.env_nee is False
