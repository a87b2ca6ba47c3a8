"""Alpha-cutout transparency: shadows and primary rays.

Reference behavior target: optix_anyhit.cuh (shadow transparency
accumulation) + device_omm.c (precomputed opacity states). Contract:
  * trace_occluded treats cutout (alpha < 1) triangles as invisible;
  * trace_transmission multiplies (1 - alpha) per crossed cutout triangle;
  * the integrator alpha-tests closest hits stochastically, so a half-alpha
    card in front of the camera blends card and background;
  * shadows behind a half-alpha card are half-lit (vs an opaque card).
"""

import numpy as np
import pytest

from luminary_tpu.scene.entities import Material, SkyMode
from luminary_tpu.scene.mesh import Mesh
from luminary_tpu.scene.scene import Scene


def _card_scene(card_alpha, width=32, height=32, big=False):
    """Sunlit ground plane with a horizontal card floating above it."""
    scene = Scene()
    scene.add_material(Material(albedo=(0.8, 0.8, 0.8, 1.0), roughness=1.0))
    scene.add_material(
        Material(albedo=(0.9, 0.2, 0.2, card_alpha), roughness=1.0)
    )
    verts = [(-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20)]
    tris = [[0, 1, 2], [0, 2, 3]]
    mat_ids = [0, 0]
    # card at y=2 centered at x=0; the tilted sun (azimuth 0, altitude
    # 0.7) throws its shadow onto the floor around x ≈ -2.9, clear of the
    # card itself, so the camera can see the shadowed floor directly
    verts += [(-1.5, 2, -1.5), (1.5, 2, -1.5), (1.5, 2, 1.5), (-1.5, 2, 1.5)]
    tris += [[4, 5, 6], [4, 6, 7]]
    mat_ids += [1, 1]
    if big:  # push past the dense tier: a far-away dummy sphere field
        rng = np.random.default_rng(0)
        base = len(verts)
        pts = rng.uniform(500, 520, (100, 3)).astype(np.float32)
        for i, p in enumerate(pts):
            b = base + i * 3
            verts += [tuple(p), tuple(p + [0.1, 0, 0]), tuple(p + [0, 0.1, 0])]
            tris += [[b, b + 1, b + 2]]
            mat_ids += [0]
    mesh = Mesh(
        vertices=np.asarray(verts, np.float32),
        triangles=np.asarray(tris, np.int32),
        material_ids=np.asarray(mat_ids, np.uint16),
        name="card",
    )
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)

    settings = scene.get_entity("settings")
    settings.width = width
    settings.height = height
    settings.max_ray_depth = 3
    scene.set_entity("settings", settings)

    cam = scene.get_entity("camera")
    cam.pos = (-2.4, 6.0, 0.0)  # straight above the card's shadow
    cam.rotation = (-np.pi / 2, 0.0, 0.0)
    cam.thin_lens.fov = 0.35  # narrow: the patch stays inside the shadow
    scene.set_entity("camera", cam)

    sky = scene.get_entity("sky")
    sky.azimuth = 0.0
    sky.altitude = 0.7  # shadow offset = 2 / tan(0.7) ≈ 2.4 toward -x
    scene.set_entity("sky", sky)
    return scene


def test_transmission_query_products():
    import jax.numpy as jnp

    from luminary_tpu.ops.traverse import trace_occluded, trace_transmission
    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.render.device_scene import pack_scene

    ds = pack_scene(_card_scene(0.5))
    bvh = ds.geo.bvh
    assert bvh.has_cutouts
    # straight up through the card from the ground: one cutout crossing
    # (x=1, z=0 stays off the quad's shared diagonal x == z)
    o = Vec3(jnp.asarray([1.0, 1.0]), jnp.asarray([0.01, 0.01]),
             jnp.asarray([0.0, 15.0]))
    d = Vec3(jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 1.0]),
             jnp.asarray([0.0, 0.0]))
    trans = np.asarray(trace_transmission(bvh, o, d, 1e7))
    # u16 micro-grid quantization: +-1/131070 (pack_device_bvh)
    np.testing.assert_allclose(trans, [0.5, 1.0], atol=2e-5)
    # binary occlusion must IGNORE the cutout card entirely
    occ = np.asarray(trace_occluded(bvh, o, d, jnp.asarray([1e7, 1e7])))
    assert not occ.any()


def test_tree_tier_shadow_rows_skip_cutouts():
    import jax.numpy as jnp

    from luminary_tpu.ops.traverse import trace_occluded
    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.render.device_scene import pack_scene

    ds = pack_scene(_card_scene(0.5, big=True))
    bvh = ds.geo.bvh
    assert bvh.tri_v0.x.shape[0] > 128  # tree tier
    assert bvh.rows_shadow is not None
    n = 16
    o = Vec3(jnp.ones((n,)), jnp.full((n,), 0.01), jnp.zeros((n,)))
    d = Vec3(jnp.zeros((n,)), jnp.ones((n,)), jnp.zeros((n,)))
    occ = np.asarray(trace_occluded(bvh, o, d, jnp.full((n,), 1e7)))
    assert not occ.any()  # only the cutout card is above — invisible


def _mean_center(scene, samples=48):
    from luminary_tpu.render.renderer import Renderer

    r = Renderer(scene, chunk=1 << 20)
    r.render_samples(samples)
    w = scene.settings.width
    h = scene.settings.height
    img = (
        np.asarray(r.accum.radiance) / np.asarray(r.accum.sample_count)[:, None]
    ).reshape(h, w, 3)
    c = img[h // 2 - 3 : h // 2 + 3, w // 2 - 3 : w // 2 + 3]
    return float(c.mean())


def test_half_alpha_card_halfway_between_opaque_and_none():
    l_opaque = _mean_center(_card_scene(1.0))
    l_half = _mean_center(_card_scene(0.5))
    l_none = _mean_center(_card_scene(0.0))
    assert l_opaque < l_half < l_none, (l_opaque, l_half, l_none)
    mid = 0.5 * (l_opaque + l_none)
    assert abs(l_half - mid) < 0.25 * (l_none - l_opaque), (
        l_opaque, l_half, l_none,
    )


def test_micro_alpha_grid_resolves_partial_cutout():
    """OMM analog (pack_device_bvh slot_cut_grid): a card whose TEXTURE is
    opaque on the left half (u < 0.5) and fully transparent on the right
    must block shadow rays only through the opaque half. The old whole-
    triangle mean alpha (0.5) attenuated both halves equally."""
    import jax.numpy as jnp

    from luminary_tpu.ops.traverse import trace_transmission
    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.render.device_scene import pack_geometry
    from luminary_tpu.scene.mesh import Texture

    scene = Scene()
    img = np.zeros((64, 64, 4), np.uint8)
    img[:, :, :3] = 200
    img[:, :32, 3] = 255  # u < 0.5 opaque
    tid = scene.add_texture(Texture(data=img, gamma=1.0))
    scene.add_material(Material(albedo=(0.8, 0.2, 0.2, 1.0), roughness=1.0))
    mat = scene.materials[0]
    mat.albedo_tex = tid
    scene.set_material(mat)
    # unit quad in the xz plane at y=2, uv = (x, z)
    verts = [(0, 2, 0), (1, 2, 0), (1, 2, 1), (0, 2, 1)]
    tris = [[0, 1, 2], [0, 2, 3]]
    uvs = np.asarray([
        [[0, 0], [1, 0], [1, 1]],
        [[0, 0], [1, 1], [0, 1]],
    ], np.float32)
    mesh = Mesh(
        vertices=np.asarray(verts, np.float32),
        triangles=np.asarray(tris, np.int32),
        material_ids=np.zeros(2, np.uint16),
        uvs=uvs,
        name="halfcard",
    )
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)
    geo = pack_geometry(scene)
    assert geo.bvh.cut_tris is not None
    assert geo.bvh.cut_tris.shape[1] >= 44  # micro-grid columns present

    def shoot(x, z):
        n = 8
        o = Vec3(jnp.full((n,), x, jnp.float32), jnp.zeros((n,), jnp.float32),
                 jnp.full((n,), z, jnp.float32))
        d = Vec3(jnp.zeros((n,)), jnp.ones((n,)), jnp.zeros((n,)))
        tr = trace_transmission(geo.bvh, o, d, jnp.full((n,), 10.0))
        return float(np.asarray(tr)[0])

    assert shoot(0.2, 0.3) < 0.05   # through the opaque texture half
    assert shoot(0.8, 0.3) > 0.95   # through the transparent half
    assert shoot(0.2, 0.8) < 0.05   # second triangle, opaque half
    assert shoot(0.8, 0.7) > 0.95
