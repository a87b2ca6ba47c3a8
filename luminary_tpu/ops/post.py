"""Camera post-processing: bloom pyramid, purkinje shift, film grain,
color correction.

Mirrors the reference's post stack (reference: src/luminary/device/
device_post.c:18-99 — 13-tap box downsample / 9-tap tent upsample mip chain
blended by bloom_blend; cuda/purkinje.cuh — low-light rod-vision shift;
kernels.cuh convert_RGBF_to_ARGB8 — film grain + color correction). All ops
are dense [H, W, 3] image passes — ideal XLA fusion targets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .random import RandomTarget, random_1d


def _downsample_13tap(img: jnp.ndarray) -> jnp.ndarray:
    """Half-res downsample with the 13-tap partial Karis average pattern
    (reference: device_post.c downsample kernel). Implemented as an average
    of four overlapping 2x2 box filters + center weighting."""
    h, w, _ = img.shape
    h2, w2 = h // 2, w // 2

    def at(dy, dx):
        ys = jnp.clip(jnp.arange(h2) * 2 + dy, 0, h - 1)
        xs = jnp.clip(jnp.arange(w2) * 2 + dx, 0, w - 1)
        return img[ys][:, xs]

    # center 2x2
    c = (at(0, 0) + at(0, 1) + at(1, 0) + at(1, 1)) * 0.25
    # corner 2x2 boxes
    tl = (at(-1, -1) + at(-1, 0) + at(0, -1) + at(0, 0)) * 0.25
    tr = (at(-1, 1) + at(-1, 2) + at(0, 1) + at(0, 2)) * 0.25
    bl = (at(1, -1) + at(1, 0) + at(2, -1) + at(2, 0)) * 0.25
    br = (at(1, 1) + at(1, 2) + at(2, 1) + at(2, 2)) * 0.25
    return c * 0.5 + (tl + tr + bl + br) * 0.125


def _upsample_tent(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """9-tap tent upsample (reference: device_post.c upsample kernel) —
    bilinear 2x resize followed by a 3x3 tent filter."""
    up = jax.image.resize(img, (out_h, out_w, img.shape[-1]), method="bilinear")
    # 3x3 tent [1 2 1]/4 separable
    k = jnp.asarray([0.25, 0.5, 0.25])
    padded = jnp.pad(up, ((1, 1), (0, 0), (0, 0)), mode="edge")
    up = padded[:-2] * k[0] + padded[1:-1] * k[1] + padded[2:] * k[2]
    padded = jnp.pad(up, ((0, 0), (1, 1), (0, 0)), mode="edge")
    return padded[:, :-2] * k[0] + padded[:, 1:-1] * k[1] + padded[:, 2:] * k[2]


def apply_bloom(img: jnp.ndarray, blend: float) -> jnp.ndarray:
    """Mip-pyramid bloom blended into the frame (reference: device_post.c
    _device_post_apply_bloom; blend = camera.bloom_blend)."""
    h, w, _ = img.shape
    num_mips = 0
    mh, mw = h, w
    while mh >= 16 and mw >= 16 and num_mips < 8:
        mh //= 2
        mw //= 2
        num_mips += 1
    if num_mips == 0:
        return img
    blend = jnp.clip(jnp.asarray(blend), 0.0, 1.0)

    mips = []
    cur = img
    for _ in range(num_mips):
        cur = _downsample_13tap(cur)
        mips.append(cur)

    # collapse the chain back up, accumulating
    acc = mips[-1]
    for level in range(num_mips - 2, -1, -1):
        th, tw = mips[level].shape[0], mips[level].shape[1]
        acc = mips[level] + _upsample_tent(acc, th, tw)
    bloom = _upsample_tent(acc, h, w) / num_mips
    return img * (1.0 - blend) + bloom * blend


def apply_purkinje(img: jnp.ndarray, kappa1: float, kappa2: float) -> jnp.ndarray:
    """Purkinje low-light blue shift (reference: cuda/purkinje.cuh): rod
    response desaturates and blue-shifts scotopic regions."""
    # approximate rod (scotopic) response
    scotopic = (
        -0.702 * img[..., 0] + 1.039 * img[..., 1] + 0.433 * img[..., 2]
    )
    scotopic = jnp.maximum(scotopic, 0.0)[..., None]
    photopic = (
        0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    )[..., None]
    # mesopic blend factor: rods dominate as luminance drops
    rod_weight = jnp.exp(-photopic / jnp.maximum(kappa1, 1e-5))
    rod_color = scotopic * jnp.asarray([0.25, 0.45, 1.0]) * (1.0 + kappa2)
    return img * (1.0 - rod_weight) + rod_color * rod_weight


def apply_color_correction(img: jnp.ndarray, correction) -> jnp.ndarray:
    """HSV-ish per-channel gain offsets (reference: tonemap.cuh color
    correction — rgb deltas in [-1, 1] applied as exposure-style gains)."""
    gain = jnp.exp2(jnp.asarray(correction) * 2.0)
    return img * gain


def apply_film_grain(img: jnp.ndarray, strength: float, seed) -> jnp.ndarray:
    """Luminance-modulated random grain (reference: kernels.cuh film grain)."""
    h, w, _ = img.shape
    pid = jnp.arange(h * w, dtype=jnp.uint32).reshape(h, w)
    g = random_1d(RandomTarget.DITHER, pid, jnp.asarray(seed, jnp.uint32) + 1)
    grain = (g - 0.5)[..., None] * strength
    return jnp.clip(img * (1.0 + grain), 0.0, None)
