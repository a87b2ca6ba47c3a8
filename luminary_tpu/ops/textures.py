"""Texture atlas + shading-time fetch.

The reference binds per-texture CUDA texture objects with hardware bilinear
fetch (reference: device_texture.c, cuda/texture_utils.cuh). On TPU a texel
fetch is an O(N·table) select-scan, so the atlas is aggressively sized: every
texture is box-resampled to a fixed ATLAS_RES² page at pack time and fetches
are nearest-tap by default (bilinear = 4x cost, enabled per call). Full-res
texturing via MXU one-hot tiles is the planned upgrade path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

ATLAS_RES = 64  # pages are ATLAS_RES x ATLAS_RES RGBA


class DeviceTextures(NamedTuple):
    atlas_r: jnp.ndarray  # f32 [num_pages * R * R], linear color
    atlas_g: jnp.ndarray
    atlas_b: jnp.ndarray
    atlas_a: jnp.ndarray
    num_pages: jnp.ndarray  # i32 scalar


def _resize_area(img: np.ndarray, res: int) -> np.ndarray:
    """Box-ish resample to res x res (bilinear sampling of the source)."""
    h, w = img.shape[:2]
    ys = (np.arange(res) + 0.5) * h / res - 0.5
    xs = (np.arange(res) + 0.5) * w / res - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    a = img[y0][:, x0] * (1 - fy) * (1 - fx)
    b = img[y0][:, x1] * (1 - fy) * fx
    c = img[y1][:, x0] * fy * (1 - fx)
    d = img[y1][:, x1] * fy * fx
    return a + b + c + d


def pack_textures(textures) -> DeviceTextures:
    """Scene texture list → flat atlas (numpy; device_put by the caller)."""
    pages = []
    for tex in textures:
        f = tex.as_float()
        if f.ndim == 4:  # 3D textures (cloud noise) are not atlas paged
            continue
        if f.shape[-1] == 3:
            f = np.concatenate([f, np.ones_like(f[..., :1])], axis=-1)
        elif f.shape[-1] == 1:
            f = np.concatenate([f.repeat(3, -1), np.ones_like(f)], axis=-1)
        pages.append(_resize_area(f[..., :4], ATLAS_RES).astype(np.float32))
    if not pages:
        atlas = np.ones((1 * ATLAS_RES * ATLAS_RES, 4), np.float32)
    else:
        atlas = np.stack(pages).reshape(-1, 4)
    return DeviceTextures(
        atlas_r=np.ascontiguousarray(atlas[:, 0]),
        atlas_g=np.ascontiguousarray(atlas[:, 1]),
        atlas_b=np.ascontiguousarray(atlas[:, 2]),
        atlas_a=np.ascontiguousarray(atlas[:, 3]),
        num_pages=np.int32(len(pages)),
    )


def sample_atlas(tex: DeviceTextures, tex_id, u, v):
    """Nearest-tap fetch: [N] page ids (+ids < 0 → white), [N] uv (repeat
    wrap). Returns (r, g, b, a) channel arrays."""
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    x = jnp.clip((uu * ATLAS_RES).astype(jnp.int32), 0, ATLAS_RES - 1)
    y = jnp.clip((vv * ATLAS_RES).astype(jnp.int32), 0, ATLAS_RES - 1)
    page = jnp.maximum(tex_id, 0)
    idx = page * (ATLAS_RES * ATLAS_RES) + y * ATLAS_RES + x
    present = tex_id >= 0
    return (
        jnp.where(present, tex.atlas_r[idx], 1.0),
        jnp.where(present, tex.atlas_g[idx], 1.0),
        jnp.where(present, tex.atlas_b[idx], 1.0),
        jnp.where(present, tex.atlas_a[idx], 1.0),
    )
