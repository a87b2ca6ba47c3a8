"""Texture atlas: mip pyramid + bilinear fetch in two row gathers.

The reference binds per-texture CUDA texture objects with hardware
bilinear/mipmap fetch (reference: device_texture.c, cuda/texture_utils.cuh,
cuda/mipmap.cuh). The TPU equivalents:

  * every texture becomes a PAGE_RES² page plus a full mip pyramid (box
    downsample at pack time — the role of the reference's mip kernels);
  * texels are stored as PAIRED rows [texel, x-neighbor] so one bilinear
    tap = TWO row gathers (y0 row, y1 row), not four (gathers cost per
    INDEX on TPU, row width is nearly free — same trick as the sky env);
  * mip level is nearest-level (no trilinear blend), selected by the caller
    from a ray-footprint LOD estimate.

Layout: all pages and their mips live in one flat row table
`rows [total_texels, 8]` (rgba + x-neighbor rgba). A page occupies
PAGE_STRIDE consecutive rows: level l starts at LEVEL_OFFSET[l] with
resolution PAGE_RES >> l.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

PAGE_RES = 256
NUM_LEVELS = 9  # 256 ... 1
LEVEL_OFFSET = []
_off = 0
for _l in range(NUM_LEVELS):
    LEVEL_OFFSET.append(_off)
    _off += (PAGE_RES >> _l) ** 2
PAGE_STRIDE = _off  # 87381


class DeviceTextures(NamedTuple):
    rows: jnp.ndarray  # f32 [num_pages * PAGE_STRIDE, 8] (or [1, 8] dummy)
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


def _page_rows(img: np.ndarray) -> np.ndarray:
    """One page: mip pyramid (box halving) → paired rows [PAGE_STRIDE, 8]."""
    rows = np.zeros((PAGE_STRIDE, 8), np.float32)
    level = _resize_area(img, PAGE_RES).astype(np.float32)
    for l in range(NUM_LEVELS):
        r = PAGE_RES >> l
        flat = level.reshape(r * r, 4)
        neigh = np.roll(level, -1, axis=1).reshape(r * r, 4)  # repeat wrap
        rows[LEVEL_OFFSET[l] : LEVEL_OFFSET[l] + r * r, 0:4] = flat
        rows[LEVEL_OFFSET[l] : LEVEL_OFFSET[l] + r * r, 4:8] = neigh
        if r > 1:  # 2x2 box for the next level
            level = 0.25 * (
                level[0::2, 0::2] + level[1::2, 0::2]
                + level[0::2, 1::2] + level[1::2, 1::2]
            )
    return rows


def pack_textures(textures) -> DeviceTextures:
    """Scene texture list → mip-pyramid row atlas (numpy; device_put by the
    caller)."""
    pages = []
    for tex in textures:
        f = tex.as_float()
        if f.ndim == 4:  # 3D textures (cloud noise) are not atlas paged
            continue
        if f.shape[-1] == 3:
            f = np.concatenate([f, np.ones_like(f[..., :1])], axis=-1)
        elif f.shape[-1] == 1:
            f = np.concatenate([f.repeat(3, -1), np.ones_like(f)], axis=-1)
        pages.append(_page_rows(f[..., :4]))
    if not pages:
        rows = np.ones((1, 8), np.float32)
    else:
        rows = np.concatenate(pages, axis=0)
    return DeviceTextures(rows=rows, num_pages=np.int32(len(pages)))


def _bilinear_level(tex: DeviceTextures, page, level, u, v):
    """One bilinear tap at an integer mip level: two row gathers."""
    res = (PAGE_RES >> level).astype(jnp.float32)
    lvl_off = jnp.asarray(np.asarray(LEVEL_OFFSET, np.int32))[level]
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    x = uu * res - 0.5
    y = vv * res - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    resi = res.astype(jnp.int32)
    x0i = jnp.mod(x0.astype(jnp.int32), resi)  # repeat wrap
    y0i = jnp.mod(y0.astype(jnp.int32), resi)
    y1i = jnp.mod(y0i + 1, resi)
    base = page * PAGE_STRIDE + lvl_off
    r0 = tex.rows[base + y0i * resi + x0i]  # [N, 8]: (x0, x0+1) at y0
    r1 = tex.rows[base + y1i * resi + x0i]
    top = r0[:, 0:4] * (1.0 - fx) + r0[:, 4:8] * fx
    bot = r1[:, 0:4] * (1.0 - fx) + r1[:, 4:8] * fx
    return top * (1.0 - fy) + bot * fy


def sample_atlas(tex: DeviceTextures, tex_id, u, v, lod=None,
                 trilinear: bool = True):
    """Mipmapped fetch. tex_id < 0 → white.

    lod: per-lane mip level (float, clamped); None = level 0.
    trilinear=True lerps the two straddling mip levels (the reference's
    hardware trilinear, cuda/texture_utils.cuh) at 4 row gathers; False =
    nearest level at 2 gathers (aux maps where level popping is invisible).
    """
    present = tex_id >= 0
    page = jnp.where(present, tex_id, 0)
    if lod is None:
        out = _bilinear_level(
            tex, page, jnp.zeros_like(u, dtype=jnp.int32), u, v)
    else:
        lodc = jnp.clip(lod, 0.0, NUM_LEVELS - 1.0)
        l0 = lodc.astype(jnp.int32)
        if trilinear:
            l1 = jnp.minimum(l0 + 1, NUM_LEVELS - 1)
            fl = (lodc - l0.astype(jnp.float32))[..., None]
            out = (_bilinear_level(tex, page, l0, u, v) * (1.0 - fl)
                   + _bilinear_level(tex, page, l1, u, v) * fl)
        else:
            out = _bilinear_level(tex, page, l0, u, v)
    w = present[..., None]
    out = jnp.where(w, out, 1.0)
    return out[..., 0], out[..., 1], out[..., 2], out[..., 3]
