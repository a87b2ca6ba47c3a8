"""GGX microfacet BSDF: sampling, evaluation, energy compensation.

Covers the reference's BSDF stack (reference: src/luminary/device/cuda/
bsdf.cuh:11-85, bsdf_utils.cuh — bounded-VNDF reflection sampling
[Eto-Tokuyoshi 2023], Smith height-correlated masking, dielectric/conductor
fresnel, multiscatter energy-compensation LUTs built on device,
device_bsdf.c). Our directional-albedo LUT is jit-precomputed with a
deterministic VNDF-importance quadrature, and energy compensation uses the
Turquin-style 1 + F_avg (1-E)/E multiplier driven by that LUT.

Component-SoA: directions are Vec3 bundles in the LOCAL shading frame
(z = normal); colors are (r, g, b) channel tuples.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .vec import Vec3, dot, normalize, reflect

MIN_ROUGHNESS = 0.025  # clamp like the reference's roughness_clamp floor


# ---------------------------------------------------------------------------
# Microfacet building blocks
# ---------------------------------------------------------------------------


def roughness_to_alpha(roughness: jnp.ndarray) -> jnp.ndarray:
    r = jnp.maximum(roughness, MIN_ROUGHNESS)
    return r * r


def ggx_ndf(alpha: jnp.ndarray, cos_h: jnp.ndarray) -> jnp.ndarray:
    a2 = alpha * alpha
    c2 = cos_h * cos_h
    d = c2 * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-12)


def _smith_lambda(alpha: jnp.ndarray, cos_t: jnp.ndarray) -> jnp.ndarray:
    c2 = jnp.clip(cos_t * cos_t, 1e-8, 1.0)
    t2 = (1.0 - c2) / c2
    return 0.5 * (jnp.sqrt(1.0 + alpha * alpha * t2) - 1.0)


def smith_g1(alpha, cos_t):
    return 1.0 / (1.0 + _smith_lambda(alpha, cos_t))


def smith_g2(alpha, cos_o, cos_i):
    """Height-correlated Smith masking-shadowing."""
    return 1.0 / (1.0 + _smith_lambda(alpha, cos_o) + _smith_lambda(alpha, cos_i))


def sample_vndf_bounded(wo_l: Vec3, alpha: jnp.ndarray, r2: jnp.ndarray) -> Vec3:
    """Bounded VNDF sampling of the GGX half-vector (Eto & Tokuyoshi 2023 —
    the paper the reference cites, bsdf_utils.cuh:176-180). Local frame."""
    wo_std = normalize(Vec3(wo_l.x * alpha, wo_l.y * alpha, wo_l.z))
    alpha_c = jnp.minimum(alpha, 1.0)
    s = 1.0 + jnp.sqrt(jnp.maximum(wo_l.x * wo_l.x + wo_l.y * wo_l.y, 0.0))
    a2 = alpha_c * alpha_c
    s2 = s * s
    k = (1.0 - a2) * s2 / (s2 + a2 * wo_l.z * wo_l.z)

    b = jnp.where(wo_l.z > 0.0, k * wo_std.z, wo_std.z)
    phi = 2.0 * jnp.pi * r2[..., 0]
    z = (1.0 - r2[..., 1]) * (1.0 + b) - b
    sin_t = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    cx = sin_t * jnp.cos(phi) + wo_std.x
    cy = sin_t * jnp.sin(phi) + wo_std.y
    cz = z + wo_std.z
    return normalize(Vec3(cx * alpha, cy * alpha, jnp.maximum(cz, 0.0)))


def sample_vndf(wo_l: Vec3, alpha: jnp.ndarray, r2: jnp.ndarray) -> Vec3:
    """Standard Smith-VNDF half-vector sampling (Heitz 2018) — valid for
    transmission too, unlike the bounded variant (the reference's refraction
    sampler is the spherical-caps formulation of the same distribution,
    bsdf_utils.cuh:269). Local frame, wo_l.z > 0 expected."""
    v = normalize(Vec3(wo_l.x * alpha, wo_l.y * alpha, wo_l.z))
    # orthonormal basis around v
    lensq = v.x * v.x + v.y * v.y
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    t1 = vwhere_scalar(
        lensq > 1e-12,
        Vec3(-v.y * inv, v.x * inv, jnp.zeros_like(v.x)),
        Vec3(jnp.ones_like(v.x), jnp.zeros_like(v.x), jnp.zeros_like(v.x)),
    )
    t2 = Vec3(
        v.y * t1.z - v.z * t1.y,
        v.z * t1.x - v.x * t1.z,
        v.x * t1.y - v.y * t1.x,
    )
    r = jnp.sqrt(jnp.clip(r2[..., 0], 0.0, 1.0))
    phi = 2.0 * jnp.pi * r2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v.z)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    pz = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = Vec3(
        p1 * t1.x + p2 * t2.x + pz * v.x,
        p1 * t1.y + p2 * t2.y + pz * v.y,
        p1 * t1.z + p2 * t2.z + pz * v.z,
    )
    return normalize(Vec3(nh.x * alpha, nh.y * alpha, jnp.maximum(nh.z, 1e-6)))


def vwhere_scalar(c, a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y), jnp.where(c, a.z, b.z)
    )


def vndf_bounded_pdf(wo_l: Vec3, wi_l: Vec3, alpha):
    """PDF of sample_vndf_bounded over wi (reflected solid angle)."""
    h = normalize(wo_l + wi_l)
    ndf = ggx_ndf(alpha, h.z)
    aix = alpha * wo_l.x
    aiy = alpha * wo_l.y
    len2 = aix * aix + aiy * aiy
    t = jnp.sqrt(len2 + wo_l.z * wo_l.z)
    alpha_c = jnp.minimum(alpha, 1.0)
    s = 1.0 + jnp.sqrt(jnp.maximum(wo_l.x * wo_l.x + wo_l.y * wo_l.y, 0.0))
    a2 = alpha_c * alpha_c
    s2 = s * s
    k = (1.0 - a2) * s2 / (s2 + a2 * wo_l.z * wo_l.z)
    pdf_upper = ndf / (2.0 * (k * wo_l.z + t))
    pdf_lower = ndf * (t - wo_l.z) / (2.0 * len2 + 1e-12)
    return jnp.where(wo_l.z >= 0.0, pdf_upper, pdf_lower)


# ---------------------------------------------------------------------------
# Fresnel
# ---------------------------------------------------------------------------


def fresnel_schlick(f0, cos_t):
    """Scalar-channel Schlick; call per channel for RGB."""
    m = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    m5 = (m * m) * (m * m) * m
    return f0 + (1.0 - f0) * m5


def fresnel_dielectric(cos_i: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Exact unpolarized dielectric Fresnel; eta = n_transmit / n_incident."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 - cos_i * cos_i) / jnp.maximum(eta * eta, 1e-8)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_t, 0.0, 1.0))
    rs = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-8)
    rp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-8)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, f)


# ---------------------------------------------------------------------------
# Directional-albedo LUT (energy compensation)
# ---------------------------------------------------------------------------

_LUT_RES = 32
_LUT_CACHE_PATH = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "..", "data", "ggx_energy_lut.npy"
)


@lru_cache(maxsize=1)
def ggx_energy_lut() -> jax.Array:
    """E(μo, roughness): single-scatter directional albedo of the GGX lobe
    with F=1 on a 32x32 grid (the role of the reference's 32³ bsdf LUTs,
    device_utils.h:42). Computed once with deterministic VNDF importance
    sampling (estimator E = mean(G2/G1)), cached to data/."""
    import os

    if os.path.exists(_LUT_CACHE_PATH):
        arr = np.load(_LUT_CACHE_PATH)
        if arr.shape == (_LUT_RES, _LUT_RES):
            return jnp.asarray(arr)

    def compute():
        mu = jnp.linspace(0.02, 1.0, _LUT_RES)
        rough = jnp.linspace(0.0, 1.0, _LUT_RES)
        alpha = roughness_to_alpha(rough)

        n = 1024
        i = jnp.arange(n, dtype=jnp.float32) + 0.5
        g = 1.32471795724474602596
        r2 = jnp.stack([jnp.mod(i / g, 1.0), jnp.mod(i / (g * g), 1.0)], axis=-1)

        def entry(mu_o, a):
            sin_o = jnp.sqrt(jnp.maximum(1.0 - mu_o**2, 0.0))
            wo = Vec3(
                jnp.broadcast_to(sin_o, (n,)),
                jnp.zeros((n,)),
                jnp.broadcast_to(mu_o, (n,)),
            )
            a_b = jnp.broadcast_to(a, (n,))
            h = sample_vndf_bounded(wo, a_b, r2)
            wi = reflect(-wo, h)
            ok = wi.z > 0.0
            w = smith_g2(a_b, wo.z, wi.z) / jnp.maximum(smith_g1(a_b, wo.z), 1e-6)
            return jnp.mean(jnp.where(ok, w, 0.0))

        f = jax.vmap(lambda m: jax.vmap(lambda al: entry(m, al))(alpha))(mu)
        return jnp.clip(f, 1e-3, 1.0)

    lut = jax.jit(compute)()
    try:
        np.save(_LUT_CACHE_PATH, np.asarray(lut))
    except OSError:
        pass
    return lut


@lru_cache(maxsize=1)
def _ggx_energy_quad() -> np.ndarray:
    """Bilinear-quad layout of the energy LUT: row i*RES+j carries the four
    corners (E[i,j], E[i+1,j], E[i,j+1], E[i+1,j+1]) so one interpolated
    fetch is ONE row gather instead of four flat gathers (gathers cost per
    INDEX on TPU; the 4-gather form measured ~220 ms/sample, round 4).
    Cached as NUMPY — a cached jnp array created under an active trace
    would leak that trace's tracer into later jits."""
    lut = np.asarray(ggx_energy_lut())
    i1 = np.minimum(np.arange(_LUT_RES) + 1, _LUT_RES - 1)
    quad = np.stack(
        [lut, lut[i1, :], lut[:, i1], lut[i1][:, i1]], axis=-1
    ).reshape(-1, 4)
    return quad.astype(np.float32)


def energy_compensation_gain(cos_o: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """(1-E)/E from the LUT — multiply by F_avg and add 1 at the call site."""
    quad = jnp.asarray(_ggx_energy_quad())
    mu_i = jnp.clip((cos_o - 0.02) / 0.98, 0.0, 1.0) * (_LUT_RES - 1)
    r_i = jnp.clip(roughness, 0.0, 1.0) * (_LUT_RES - 1)
    i0 = jnp.clip(mu_i.astype(jnp.int32), 0, _LUT_RES - 2)
    j0 = jnp.clip(r_i.astype(jnp.int32), 0, _LUT_RES - 2)
    fi, fj = mu_i - i0, r_i - j0
    from .rowops import gather_planar

    q = gather_planar(quad, i0 * _LUT_RES + j0)  # planar [4, N] — one gather
    e = (
        q[0] * (1 - fi) * (1 - fj)
        + q[1] * fi * (1 - fj)
        + q[2] * (1 - fi) * fj
        + q[3] * fi * fj
    )
    return (1.0 - e) / e


# ---------------------------------------------------------------------------
# Lobe eval in local frame (RGB as channel tuples)
# ---------------------------------------------------------------------------


def ggx_reflect_eval(wo_l: Vec3, wi_l: Vec3, alpha, f0_rgb, roughness):
    """Specular lobe value·cos (RGB tuple, fresnel + multiscatter included)
    and its sampling pdf. Zero below the horizon."""
    cos_o = wo_l.z
    cos_i = wi_l.z
    valid = (cos_o > 0.0) & (cos_i > 0.0)
    h = normalize(wo_l + wi_l)
    cos_h = jnp.clip(h.z, 0.0, 1.0)
    cos_oh = jnp.clip(dot(wo_l, h), 0.0, 1.0)
    d = ggx_ndf(alpha, cos_h)
    g2 = smith_g2(alpha, cos_o, cos_i)
    base = d * g2 / jnp.maximum(4.0 * cos_o, 1e-8)  # f_r * cos_i premultiplied
    f0r, f0g, f0b = f0_rgb
    f0_avg = (f0r + f0g + f0b) * (1.0 / 3.0)
    gain = energy_compensation_gain(cos_o, roughness)
    comp = 1.0 + f0_avg * gain
    scale = jnp.where(valid, base * comp, 0.0)
    fr = fresnel_schlick(f0r, cos_oh) * scale
    fg = fresnel_schlick(f0g, cos_oh) * scale
    fb = fresnel_schlick(f0b, cos_oh) * scale
    pdf = vndf_bounded_pdf(wo_l, wi_l, alpha)
    return (fr, fg, fb), jnp.where(valid, pdf, 0.0)


def diffuse_eval(wi_l: Vec3, kd_rgb):
    """Lambert lobe·cos: kd/π · cos_i, pdf = cos_i/π. RGB channel tuple."""
    cos_i = jnp.maximum(wi_l.z, 0.0)
    w = cos_i * (1.0 / jnp.pi)
    kr, kg, kb = kd_rgb
    return (kr * w, kg * w, kb * w), w
