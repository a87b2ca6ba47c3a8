"""Tonemapping, color transforms, filters, dithering.

Covers the reference's camera post color pipeline (reference:
src/luminary/device/cuda/tonemap.cuh — ACES/Reinhard/Uncharted2/AGX variants;
kernels.cuh convert_RGBF_to_ARGB8 — filters, dithering, sRGB). Formulas are
the standard public ones (Narkowicz ACES fit, Hable Uncharted2 operator,
Benjamin/Troy AGX matrices).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import math3
from .random import RandomTarget, random_1d

# --- tonemap operators -----------------------------------------------------


def tm_aces(x: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz's ACES filmic fit."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = x * 0.6
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def tm_reinhard(x: jnp.ndarray) -> jnp.ndarray:
    return x / (1.0 + math3.luminance(x)[..., None])


def _uncharted2_curve(x):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


def tm_uncharted2(x: jnp.ndarray) -> jnp.ndarray:
    exposure_bias = 2.0
    white = _uncharted2_curve(jnp.asarray(11.2))
    return jnp.clip(_uncharted2_curve(x * exposure_bias) / white, 0.0, 1.0)


# AGX (Troy Sobotka's AgX, Benjamin Wrensch's approximation constants).
_AGX_IN = np.asarray(
    [
        [0.842479062253094, 0.0423282422610123, 0.0423756549057051],
        [0.0784335999999992, 0.878468636469772, 0.0784336],
        [0.0792237451477643, 0.0791661274605434, 0.879142973793104],
    ]
)
_AGX_OUT = np.asarray(
    [
        [1.19687900512017, -0.0528968517574562, -0.0529716355144438],
        [-0.0980208811401368, 1.15190312990417, -0.0980434501171241],
        [-0.0990297440797205, -0.0989611768448433, 1.15107367264116],
    ]
)


def _agx_default_contrast(x):
    """6th-order polynomial sigmoid approximation."""
    x2 = x * x
    x4 = x2 * x2
    return (
        15.5 * x4 * x2
        - 40.14 * x4 * x
        + 31.96 * x4
        - 6.868 * x2 * x
        + 0.4298 * x2
        + 0.1191 * x
        - 0.00232
    )


def _agx_base(x: jnp.ndarray) -> jnp.ndarray:
    min_ev, max_ev = -12.47393, 4.026069
    x = x @ _AGX_IN.T
    x = jnp.clip(jnp.log2(jnp.maximum(x, 1e-10)), min_ev, max_ev)
    x = (x - min_ev) / (max_ev - min_ev)
    return _agx_default_contrast(x)


def _agx_look(x, offset, slope, power, saturation):
    lw = math3.luminance(x)[..., None]
    x = jnp.power(jnp.maximum(x * slope + offset, 0.0), power)
    return lw + saturation * (x - lw)


def tm_agx(x: jnp.ndarray, look: int = 0, custom=(1.0, 1.0, 1.0)) -> jnp.ndarray:
    """look: 0=default, 1=punchy, 2=custom(slope, power, saturation)."""
    v = _agx_base(x)
    if look == 1:
        v = _agx_look(v, 0.0, 1.0, 1.35, 1.4)
    elif look == 2:
        slope, power, saturation = custom
        v = _agx_look(v, 0.0, slope, power, saturation)
    v = v @ _AGX_OUT.T
    return jnp.clip(v, 0.0, 1.0)


def apply_tonemap(x: jnp.ndarray, tonemap: int, agx_custom=(1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Static dispatch on the ToneMap enum (compiled per output config, like
    the reference's per-settings kernel specialization)."""
    if tonemap == 0:
        return jnp.clip(x, 0.0, 1.0)
    if tonemap == 1:
        return tm_aces(x)
    if tonemap == 2:
        return jnp.clip(tm_reinhard(x), 0.0, 1.0)
    if tonemap == 3:
        return tm_uncharted2(x)
    if tonemap == 4:
        return tm_agx(x, 0)
    if tonemap == 5:
        return tm_agx(x, 1)
    if tonemap == 6:
        return tm_agx(x, 2, agx_custom)
    raise ValueError(f"unknown tonemap {tonemap}")


# --- LDR filters (reference: kernels.cuh convert_RGBF_to_ARGB8 filters) ----


def apply_filter(x: jnp.ndarray, filter_id: int) -> jnp.ndarray:
    if filter_id == 0:
        return x
    lum = math3.luminance(x)[..., None]
    if filter_id == 1:  # GRAY
        return jnp.broadcast_to(lum, x.shape)
    if filter_id == 2:  # SEPIA
        r = 0.393 * x[..., 0] + 0.769 * x[..., 1] + 0.189 * x[..., 2]
        g = 0.349 * x[..., 0] + 0.686 * x[..., 1] + 0.168 * x[..., 2]
        b = 0.272 * x[..., 0] + 0.534 * x[..., 1] + 0.131 * x[..., 2]
        return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)
    if filter_id == 3:  # GAMEBOY (4-level green)
        level = jnp.round(jnp.clip(lum, 0.0, 1.0) * 3.0) / 3.0
        pal = jnp.asarray([[0.06, 0.22, 0.06], [0.19, 0.38, 0.19], [0.54, 0.67, 0.06], [0.61, 0.74, 0.06]])
        idx = jnp.round(level[..., 0] * 3.0).astype(jnp.int32)
        return pal[idx]
    if filter_id == 4:  # 2BITGRAY
        return jnp.broadcast_to(jnp.round(jnp.clip(lum, 0.0, 1.0) * 3.0) / 3.0, x.shape)
    if filter_id == 5:  # CRT — scanline darkening handled spatially in output
        return x
    if filter_id == 6:  # BLACKWHITE
        return jnp.broadcast_to((lum > 0.5).astype(x.dtype), x.shape)
    raise ValueError(f"unknown filter {filter_id}")


def apply_crt_scanlines(img: jnp.ndarray) -> jnp.ndarray:
    """CRT filter spatial part on an [H,W,3] image."""
    h = img.shape[0]
    row = jnp.arange(h) % 3
    gain = jnp.where(row == 0, 0.75, 1.0)[:, None, None]
    return img * gain


# --- sRGB + dither ---------------------------------------------------------


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x <= 0.0031308, x * 12.92, 1.055 * jnp.power(jnp.maximum(x, 1e-8), 1.0 / 2.4) - 0.055
    )


def dither_and_quantize(x: jnp.ndarray, pixel_id: jnp.ndarray, sample_id, enabled: bool) -> jnp.ndarray:
    """[...,3] in [0,1] → uint8 with triangular-ish random dither
    (reference: kernels.cuh dithering before the 8-bit conversion)."""
    v = x * 255.0
    if enabled:
        r = random_1d(RandomTarget.DITHER, pixel_id, sample_id)[..., None]
        v = v + r
    else:
        v = v + 0.5
    return jnp.clip(v, 0.0, 255.0).astype(jnp.uint8)
