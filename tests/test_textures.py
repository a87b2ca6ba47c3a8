"""Texture atlas + textured rendering tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from luminary_tpu.ops.textures import (
    NUM_LEVELS,
    PAGE_RES,
    pack_textures,
    sample_atlas,
)
from luminary_tpu.render.renderer import Renderer
from luminary_tpu.scene.mesh import Mesh, Texture
from luminary_tpu.testing import sun_plane_scene


def checker(res=128):
    y, x = np.meshgrid(range(res), range(res), indexing="ij")
    c = ((x // 16 + y // 16) % 2).astype(np.float32)
    img = np.stack([c, 1 - c, np.zeros_like(c)], axis=-1)
    return (img * 255).astype(np.uint8)


def test_pack_and_sample_atlas():
    tex = Texture(data=checker(), gamma=1.0)
    dt = pack_textures([tex])
    assert int(dt.num_pages) == 1
    dt = jnp.tree_util.tree_map(jnp.asarray, dt) if hasattr(jnp, "tree_util") else dt
    # sample corners: u,v near 0 → red-ish cell (c=0 → green channel 1)
    ids = jnp.zeros((4,), jnp.int32)
    u = jnp.asarray([0.02, 0.14, 0.02, 0.6])
    v = jnp.asarray([0.02, 0.02, 0.14, 0.6])
    import jax

    texel = np.asarray(sample_atlas(jax.device_put(dt), ids, u, v))
    # cell (0,0) is green=1 (c=0); cell one step over flips
    assert texel[0, 1] > 0.8 and texel[0, 0] < 0.2
    assert texel[1, 0] > 0.8  # flipped cell
    # missing texture → white
    texel2 = np.asarray(
        sample_atlas(jax.device_put(dt), jnp.asarray([-1]), u[:1], v[:1])
    )
    assert np.allclose(texel2, 1.0)


def test_textured_render():
    scene = sun_plane_scene(24, 24)
    tex_id = scene.add_texture(Texture(data=checker(), gamma=2.2))
    mat = scene.get_material(0)
    mat.albedo_tex = tex_id
    scene.set_material(mat)
    # give the ground plane real UVs spanning the quad
    mesh = scene.meshes[0]
    mesh.uvs = np.asarray(
        [
            [[0, 0], [4, 0], [4, 4]],
            [[0, 0], [4, 4], [0, 4]],
        ],
        np.float32,
    )
    scene.mark_dirty(__import__("luminary_tpu.scene.scene", fromlist=["DirtyFlags"]).DirtyFlags.MESHES)
    r = Renderer(scene, chunk=576)
    r.render_samples(8)
    rad = r.get_radiance()
    assert np.all(np.isfinite(rad))
    # ground rows show spatial variation from the checker (red vs green cells)
    ground = rad[16:, :, :]
    rg_diff = ground[..., 0] - ground[..., 1]
    assert rg_diff.max() > 0.01 and rg_diff.min() < -0.01, "checker not visible"


def test_mip_pyramid_converges_to_mean():
    """High LOD levels approach the texture's mean color (box pyramid;
    reference: cuda/mipmap.cuh)."""
    import jax

    tex = Texture(data=checker(), gamma=1.0)
    dt = jax.device_put(pack_textures([tex]))
    ids = jnp.zeros((1,), jnp.int32)
    u = jnp.asarray([0.37])
    v = jnp.asarray([0.61])
    coarse = np.asarray(sample_atlas(
        dt, ids, u, v, lod=jnp.asarray([float(NUM_LEVELS - 1)])
    ))
    # checker mean: half red, half green
    assert abs(coarse[0, 0] - 0.5) < 0.02
    assert abs(coarse[1, 0] - 0.5) < 0.02
    fine = np.asarray(sample_atlas(dt, ids, u, v, lod=jnp.asarray([0.0])))
    assert (abs(fine[0, 0] - 0.5) > 0.3) or (abs(fine[1, 0] - 0.5) > 0.3)


def test_trilinear_blends_between_levels():
    """Fractional LOD lerps the two straddling mip levels (reference:
    hardware trilinear filtering, cuda/texture_utils.cuh)."""
    import jax

    tex = Texture(data=checker(), gamma=1.0)
    dt = jax.device_put(pack_textures([tex]))
    ids = jnp.zeros((1,), jnp.int32)
    u = jnp.asarray([0.37])
    v = jnp.asarray([0.61])

    def tap(lod, trilinear=True):
        return np.asarray(sample_atlas(
            dt, ids, u, v, lod=jnp.asarray([lod]), trilinear=trilinear))

    l2 = tap(2.0)
    l3 = tap(3.0)
    mid = tap(2.5)
    exp = 0.5 * (l2 + l3)
    assert np.allclose(mid, exp, atol=1e-5), (mid, exp)
    # nearest-level mode truncates to the lower level
    near = tap(2.6, trilinear=False)
    assert np.allclose(near, l2, atol=1e-5)
    # integer lods agree between the two modes
    assert np.allclose(tap(1.0), tap(1.0, trilinear=False), atol=1e-6)


def test_bilinear_interpolates_gradient():
    import jax

    res = 64
    g = np.linspace(0.0, 1.0, res, dtype=np.float32)
    img = np.broadcast_to(g[None, :, None], (res, res, 3)).copy()
    tex = Texture(data=(img * 255).astype(np.uint8), gamma=1.0)
    dt = jax.device_put(pack_textures([tex]))
    n = 33
    u = jnp.linspace(0.25, 0.75, n)
    v = jnp.full((n,), 0.5)
    r, _, _, _ = sample_atlas(dt, jnp.zeros((n,), jnp.int32), u, v)
    r = np.asarray(r)
    # linear ramp: midpoints lie between neighbors (monotone, smooth)
    assert np.all(np.diff(r) > 0)
    err = np.abs(r - np.asarray(u))
    assert err.max() < 0.02, err.max()


def test_normal_map_changes_shading():
    """A strong tangent-space normal map must visibly change the lit image
    (reference: cuda/material.cuh normal map application)."""
    from luminary_tpu.scene.scene import DirtyFlags

    def render(with_nm):
        scene = sun_plane_scene(24, 24)
        mesh = scene.meshes[0]
        mesh.uvs = np.asarray(
            [[[0, 0], [4, 0], [4, 4]], [[0, 0], [4, 4], [0, 4]]], np.float32
        )
        if with_nm:
            res = 64
            yy, xx = np.meshgrid(range(res), range(res), indexing="ij")
            # wavy normals tilting along x
            nx = 0.8 * np.sin(xx / res * 12 * np.pi)
            img = np.stack([
                (nx * 0.5 + 0.5), np.full_like(nx, 0.5), np.full_like(nx, 1.0)
            ], -1).astype(np.float32)
            tid = scene.add_texture(Texture(data=(img * 255).astype(np.uint8),
                                            gamma=1.0))
            mat = scene.get_material(0)
            mat.normal_tex = tid
            scene.set_material(mat)
        scene.mark_dirty(DirtyFlags.MESHES)
        r = Renderer(scene, chunk=576)
        r.render_samples(12)
        return r.get_radiance()

    flat = render(False)
    wavy = render(True)
    assert np.isfinite(wavy).all()
    ground_f = flat[16:, :, 0]
    ground_w = wavy[16:, :, 0]
    # the normal map modulates brightness along x; the flat render doesn't
    var_w = np.var(np.mean(ground_w, axis=0))
    var_f = np.var(np.mean(ground_f, axis=0))
    assert var_w > 4 * var_f + 1e-8, (var_f, var_w)
