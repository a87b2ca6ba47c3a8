"""Texture atlas: per-texture-resolution mip pyramids + bilinear fetch in
two row gathers.

The reference binds per-texture CUDA texture objects at their NATIVE
resolution with hardware bilinear/mipmap fetch (reference: device_texture.c,
cuda/texture_utils.cuh, cuda/mipmap.cuh). The TPU equivalents:

  * every texture becomes a power-of-two page at (approximately) its own
    resolution — next_pow2(max(h, w)) clamped to [4, MAX_PAGE_RES] — plus a
    full mip pyramid (box downsample at pack time, the role of the
    reference's mip kernels);
  * texels are stored as PAIRED rows [texel, x-neighbor] so one bilinear
    tap = TWO row gathers (y0 row, y1 row), not four (gathers cost per
    INDEX on TPU, row width is nearly free — same trick as the sky env);
  * per-texture geometry (base row, resolution, level offsets) lives in a
    tiny i32 page table gathered per fetch — tables this small lower to
    selects on TPU, so the indirection is ~free.

Layout: all pages and their mips live in one flat row table
`rows [total_texels, 8]` (rgba + x-neighbor rgba). `page_table [T, 16]` i32:
col 0 = base row, col 1 = level-0 resolution, col 2 = level count,
cols 3:3+MAX_LEVELS = level start offsets within the page.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

PAGE_RES = 256  # default page resolution (textures with unknown/no dims)
MAX_PAGE_RES = 1024  # memory cap: a 1024² page costs ~44 MB of rows
MAX_LEVELS = 11  # 1024 ... 1
# Back-compat alias: the per-lane clamp inside the fetch enforces each
# texture's own level count; this is only the static upper bound.
NUM_LEVELS = MAX_LEVELS


class DeviceTextures(NamedTuple):
    rows: jnp.ndarray  # f32 [total_texels, 8] (or [1, 8] dummy)
    page_table: jnp.ndarray  # i32 [T, 16] — see module docstring
    num_pages: jnp.ndarray  # i32 scalar


def page_resolution(shape) -> int:
    """Page resolution for a texture of pixel dims (h, w)."""
    m = max(int(shape[0]), int(shape[1]), 4)
    return int(min(1 << int(np.ceil(np.log2(m))), MAX_PAGE_RES))


def page_resolutions(textures) -> np.ndarray:
    """Per-texture level-0 page resolution (PAGE_RES for 3D/absent)."""
    out = np.full(max(len(textures), 1), PAGE_RES, np.int32)
    for i, tex in enumerate(textures):
        f = tex.as_float()
        if f.ndim == 4:
            continue
        out[i] = page_resolution(f.shape[:2])
    return out


def _resize_area(img: np.ndarray, res: int) -> np.ndarray:
    """Box-ish resample to res x res (bilinear sampling of the source)."""
    h, w = img.shape[:2]
    if h == res and w == res:
        return img.astype(np.float64)
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


def _page_rows(img: np.ndarray, res: int) -> tuple[np.ndarray, list, int]:
    """One page: mip pyramid (box halving) → paired rows.

    Returns (rows [stride, 8], level_offsets, num_levels)."""
    num_levels = int(np.log2(res)) + 1
    offsets = []
    off = 0
    for l in range(num_levels):
        offsets.append(off)
        off += (res >> l) ** 2
    rows = np.zeros((off, 8), np.float32)
    level = _resize_area(img, res).astype(np.float32)
    for l in range(num_levels):
        r = res >> l
        flat = level.reshape(r * r, 4)
        neigh = np.roll(level, -1, axis=1).reshape(r * r, 4)  # repeat wrap
        rows[offsets[l] : offsets[l] + r * r, 0:4] = flat
        rows[offsets[l] : offsets[l] + r * r, 4:8] = neigh
        if r > 1:  # 2x2 box for the next level
            level = 0.25 * (
                level[0::2, 0::2] + level[1::2, 0::2]
                + level[0::2, 1::2] + level[1::2, 1::2]
            )
    return rows, offsets, num_levels


def pack_textures(textures) -> DeviceTextures:
    """Scene texture list → mip-pyramid row atlas (numpy; device_put by the
    caller). 3D textures (cloud noise) keep a dummy page-table entry — they
    are never atlas sampled."""
    t = max(len(textures), 1)
    ptab = np.zeros((t, 16), np.int32)
    ptab[:, 1] = 1  # res 1, 1 level: a degenerate always-row-0 page
    ptab[:, 2] = 1
    pages = []
    base = 0
    num_pages = 0
    for i, tex in enumerate(textures):
        f = tex.as_float()
        if f.ndim == 4:  # 3D textures (cloud noise) are not atlas paged
            continue
        if f.shape[-1] == 3:
            f = np.concatenate([f, np.ones_like(f[..., :1])], axis=-1)
        elif f.shape[-1] == 1:
            f = np.concatenate([f.repeat(3, -1), np.ones_like(f)], axis=-1)
        res = page_resolution(f.shape[:2])
        rows, offsets, levels = _page_rows(f[..., :4], res)
        ptab[i, 0] = base
        ptab[i, 1] = res
        ptab[i, 2] = levels
        ptab[i, 3 : 3 + levels] = offsets
        pages.append(rows)
        base += rows.shape[0]
        num_pages += 1
    if not pages:
        rows = np.ones((1, 8), np.float32)
    else:
        rows = np.concatenate(pages, axis=0)
    return DeviceTextures(
        rows=rows, page_table=ptab, num_pages=np.int32(num_pages)
    )


def _bilinear_level(tex: DeviceTextures, prow, level, u, v):
    """One bilinear tap at an integer mip level: two row gathers.

    prow: pre-gathered page-table rows [N, 16] (the table is tiny — XLA
    lowers its gather to selects)."""
    num_lvl = prow[:, 2]
    level = jnp.minimum(level, num_lvl - 1)
    res = (prow[:, 1] >> level).astype(jnp.float32)
    oh = jnp.arange(MAX_LEVELS, dtype=jnp.int32)[None, :] == level[:, None]
    lvl_off = jnp.sum(jnp.where(oh, prow[:, 3 : 3 + MAX_LEVELS], 0), axis=1)
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
    base = prow[:, 0] + lvl_off
    r0 = tex.rows[base + y0i * resi + x0i]  # [N, 8]: (x0, x0+1) at y0
    r1 = tex.rows[base + y1i * resi + x0i]
    top = r0[:, 0:4] * (1.0 - fx) + r0[:, 4:8] * fx
    bot = r1[:, 0:4] * (1.0 - fx) + r1[:, 4:8] * fx
    return top * (1.0 - fy) + bot * fy


def sample_atlas(tex: DeviceTextures, tex_id, u, v, lod=None,
                 trilinear: bool = True):
    """Mipmapped fetch. tex_id < 0 → white.

    lod: per-lane mip level (float, clamped to the texture's own pyramid);
    None = level 0.
    trilinear=True lerps the two straddling mip levels (the reference's
    hardware trilinear, cuda/texture_utils.cuh) at 4 row gathers; False =
    nearest level at 2 gathers (aux maps where level popping is invisible).
    """
    present = tex_id >= 0
    page = jnp.where(present, tex_id, 0)
    prow = tex.page_table[page]  # [N, 16] — tiny table, lowers to selects
    if lod is None:
        out = _bilinear_level(
            tex, prow, jnp.zeros_like(u, dtype=jnp.int32), u, v)
    else:
        lodc = jnp.clip(lod, 0.0, MAX_LEVELS - 1.0)
        l0 = lodc.astype(jnp.int32)
        if trilinear:
            fl = (lodc - l0.astype(jnp.float32))[..., None]
            out = (_bilinear_level(tex, prow, l0, u, v) * (1.0 - fl)
                   + _bilinear_level(tex, prow, l0 + 1, u, v) * fl)
        else:
            out = _bilinear_level(tex, prow, l0, u, v)
    w = present[..., None]
    out = jnp.where(w, out, 1.0)
    return out[..., 0], out[..., 1], out[..., 2], out[..., 3]
