"""Texture atlas + textured rendering tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from luminary_tpu.ops.textures import ATLAS_RES, pack_textures, sample_atlas
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
