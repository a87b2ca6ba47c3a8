"""Surface material model: lobe selection, sampling, evaluation.

Maps the reference's material semantics (reference: include/luminary/
structs.h LuminaryMaterial, cuda/bsdf.cuh lobe logic) onto three lobes:

  * metallic → GGX conductor (F0 = albedo), multiscatter-compensated;
  * opaque dielectric → GGX specular coat (F0 from ior) over Lambert diffuse,
    lobe chosen by the Fresnel-weighted probability;
  * translucent → smooth dielectric reflect/refract (delta lobes).

Component-SoA: world/local directions are Vec3 bundles, colors are (r, g, b)
channel tuples; the evaluated value is premultiplied by |cos θi|. Delta lobes
report pdf = 0 and are excluded from MIS.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ggx import (
    diffuse_eval,
    fresnel_dielectric,
    ggx_reflect_eval,
    roughness_to_alpha,
    sample_vndf,
    sample_vndf_bounded,
    smith_g1,
    smith_g2,
)
from .random import RandomTarget, random_1d, random_2d
from .vec import Vec3, dot, normalize, orthonormal_basis, reflect, vwhere


class LaneMaterial(NamedTuple):
    """Material parameters gathered per lane (RGB as channel arrays)."""

    albedo_r: jnp.ndarray
    albedo_g: jnp.ndarray
    albedo_b: jnp.ndarray
    roughness: jnp.ndarray
    metallic: jnp.ndarray  # 0/1
    ior: jnp.ndarray
    translucent: jnp.ndarray  # bool
    opacity: jnp.ndarray
    thin_walled: jnp.ndarray  # bool


# ---------------------------------------------------------------------------
# Medium stack: per-lane 2-deep IOR stack in one u32 (two f16 payloads).
# Reference: cuda/medium_stack.cuh (4-deep, 16 B) — two levels cover
# glass-in-water; the stack stores the IOR itself (not a material id) so no
# material-table gather is needed at pop time.
# ---------------------------------------------------------------------------


def medium_encode_ior(ior: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(
        ior.astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)


def _medium_decode(bits16: jnp.ndarray) -> jnp.ndarray:
    ior = jax.lax.bitcast_convert_type(
        bits16.astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    return jnp.where(bits16 == 0, 1.0, ior)  # empty slot = vacuum


def medium_top_ior(medium: jnp.ndarray) -> jnp.ndarray:
    """IOR of the medium the ray currently travels in."""
    return _medium_decode(medium & jnp.uint32(0xFFFF))


def medium_below_ior(medium: jnp.ndarray) -> jnp.ndarray:
    """IOR of the medium that becomes current after exiting the top one."""
    return _medium_decode((medium >> 16) & jnp.uint32(0xFFFF))


def medium_push(medium: jnp.ndarray, ior: jnp.ndarray) -> jnp.ndarray:
    return ((medium << 16) | medium_encode_ior(ior)).astype(jnp.uint32)


def medium_pop(medium: jnp.ndarray) -> jnp.ndarray:
    return (medium >> 16).astype(jnp.uint32)


class ShadingFrame(NamedTuple):
    """Shared per-hit shading context (built once, used by sample + both NEE
    evals — the local frame and lobe constants are the expensive parts)."""

    t: Vec3  # tangent
    b: Vec3  # bitangent
    n: Vec3  # shading normal
    wo_l: Vec3  # view dir in local frame
    alpha: jnp.ndarray
    f0_r: jnp.ndarray
    f0_g: jnp.ndarray
    f0_b: jnp.ndarray
    kd_r: jnp.ndarray
    kd_g: jnp.ndarray
    kd_b: jnp.ndarray
    p_spec: jnp.ndarray


def _f0_from_ior(ior):
    r = (ior - 1.0) / (ior + 1.0)
    return r * r


def make_frame(mat: LaneMaterial, ns: Vec3, wo: Vec3) -> ShadingFrame:
    t, b = orthonormal_basis(ns)
    wo_l = Vec3(dot(wo, t), dot(wo, b), dot(wo, ns))
    f0d = _f0_from_ior(mat.ior)
    is_metal = mat.metallic > 0.5
    f0_r = jnp.where(is_metal, mat.albedo_r, f0d)
    f0_g = jnp.where(is_metal, mat.albedo_g, f0d)
    f0_b = jnp.where(is_metal, mat.albedo_b, f0d)
    km = 1.0 - mat.metallic
    kd_r = mat.albedo_r * km
    kd_g = mat.albedo_g * km
    kd_b = mat.albedo_b * km

    cos_o = jnp.clip(wo_l.z, 0.0, 1.0)
    m = 1.0 - cos_o
    m5 = (m * m) * (m * m) * m
    f_avg = (f0_r + f0_g + f0_b) * (1.0 / 3.0)
    fres = f_avg + (1.0 - f_avg) * m5
    kd_lum = (kd_r + kd_g + kd_b) * (1.0 / 3.0)
    p = fres / jnp.maximum(fres + kd_lum * (1.0 - fres), 1e-6)
    p_spec = jnp.where(is_metal, 1.0, jnp.clip(p, 0.05, 0.95))
    return ShadingFrame(t, b, ns, wo_l, roughness_to_alpha(mat.roughness),
                        f0_r, f0_g, f0_b, kd_r, kd_g, kd_b, p_spec)


def _to_local(fr: ShadingFrame, v: Vec3) -> Vec3:
    return Vec3(dot(v, fr.t), dot(v, fr.b), dot(v, fr.n))


def _to_world(fr: ShadingFrame, v: Vec3) -> Vec3:
    return Vec3(
        fr.t.x * v.x + fr.b.x * v.y + fr.n.x * v.z,
        fr.t.y * v.x + fr.b.y * v.y + fr.n.y * v.z,
        fr.t.z * v.x + fr.b.z * v.y + fr.n.z * v.z,
    )


def frame_eval(mat: LaneMaterial, fr: ShadingFrame, roughness, wi: Vec3):
    """((fr,fg,fb) = f·cos, pdf) for an explicit world direction (NEE/MIS).
    Translucent lanes evaluate to zero (delta lobes)."""
    wi_l = _to_local(fr, wi)
    spec, pdf_spec = ggx_reflect_eval(
        fr.wo_l, wi_l, fr.alpha, (fr.f0_r, fr.f0_g, fr.f0_b), roughness
    )
    diff, pdf_diff = diffuse_eval(wi_l, (fr.kd_r, fr.kd_g, fr.kd_b))
    pdf = fr.p_spec * pdf_spec + (1.0 - fr.p_spec) * pdf_diff
    live = ~mat.translucent
    f = tuple(jnp.where(live, s + d, 0.0) for s, d in zip(spec, diff))
    return f, jnp.where(live, pdf, 0.0)


def material_eval(mat: LaneMaterial, ns: Vec3, wo: Vec3, wi: Vec3):
    """Convenience wrapper building the frame (use frame_eval + make_frame
    when evaluating several directions at one hit)."""
    fr = make_frame(mat, ns, wo)
    return frame_eval(mat, fr, mat.roughness, wi)


def material_sample(mat: LaneMaterial, fr: ShadingFrame, ns: Vec3, wo: Vec3,
                    pixel_id, sample_id, depth, eta_rel=None, bn=None):
    """Sample an outgoing direction.

    eta_rel: per-lane n_transmitted / n_incident for the translucent lobe,
    supplied by the integrator's medium stack (entering: ior_mat / ior_cur,
    exiting: ior_below / ior_cur). None falls back to ior-vs-vacuum.

    Returns (wi Vec3, weight (r,g,b) = f·cos/pdf, pdf, is_delta, transmitted).
    """
    wo_l = fr.wo_l
    r_choice = random_1d(RandomTarget.BSDF_CHOICE, pixel_id, sample_id, depth,
                         bn=bn)
    r2 = random_2d(RandomTarget.BSDF_REFLECTION, pixel_id, sample_id, depth,
                   bn=bn)

    # --- opaque path: specular or diffuse ---
    choose_spec = r_choice < fr.p_spec
    h = sample_vndf_bounded(wo_l, fr.alpha, r2)
    wi_spec_l = reflect(-wo_l, h)
    phi = 2.0 * jnp.pi * r2[..., 0]
    sr = jnp.sqrt(jnp.clip(r2[..., 1], 0.0, 1.0))
    wi_diff_l = Vec3(
        jnp.cos(phi) * sr,
        jnp.sin(phi) * sr,
        jnp.sqrt(jnp.maximum(1.0 - r2[..., 1], 0.0)),
    )
    wi_l = vwhere(choose_spec, wi_spec_l, wi_diff_l)
    spec, pdf_spec = ggx_reflect_eval(
        wo_l, wi_l, fr.alpha, (fr.f0_r, fr.f0_g, fr.f0_b), mat.roughness
    )
    diff, pdf_diff = diffuse_eval(wi_l, (fr.kd_r, fr.kd_g, fr.kd_b))
    pdf = fr.p_spec * pdf_spec + (1.0 - fr.p_spec) * pdf_diff
    ok = (wi_l.z > 0.0) & (pdf > 1e-10)
    inv_pdf = jnp.where(ok, 1.0 / jnp.maximum(pdf, 1e-10), 0.0)
    w_opaque = tuple((s + d) * inv_pdf for s, d in zip(spec, diff))

    # --- translucent path: ROUGH dielectric (GGX VNDF half-vector +
    # Fresnel-split reflect/refract; reference bsdf_utils.cuh:269 spherical-
    # caps VNDF refraction). The shading frame is flipped toward the ray, so
    # wo_l.z > 0 and the transmission side is -z; eta_rel carries the real
    # medium transition from the integrator's stack. ---
    eta = eta_rel if eta_rel is not None else mat.ior
    ht = sample_vndf(wo_l, fr.alpha, r2)
    cos_oh = jnp.clip(dot(wo_l, ht), 1e-6, 1.0)
    fres = fresnel_dielectric(cos_oh, eta)
    # thin-walled: both interfaces collapse; net reflectance 2F/(1+F)
    fres = jnp.where(mat.thin_walled, 2.0 * fres / (1.0 + fres), fres)
    choose_reflect = r_choice < fres
    wi_refl_l = reflect(-wo_l, ht)
    inv_eta = 1.0 / jnp.maximum(eta, 1e-6)
    sin2_t = inv_eta * inv_eta * jnp.maximum(1.0 - cos_oh * cos_oh, 0.0)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_t, 0.0, 1.0))
    # refract about the sampled half-vector
    wi_refr_l = Vec3(
        -wo_l.x * inv_eta + (inv_eta * cos_oh - cos_t) * ht.x,
        -wo_l.y * inv_eta + (inv_eta * cos_oh - cos_t) * ht.y,
        -wo_l.z * inv_eta + (inv_eta * cos_oh - cos_t) * ht.z,
    )
    # thin-walled transmission: straight through, no bend
    wi_thin_l = Vec3(-wo_l.x, -wo_l.y, -wo_l.z)
    wi_refr_l = vwhere(mat.thin_walled, wi_thin_l, wi_refr_l)
    choose_reflect = choose_reflect | (tir & ~mat.thin_walled)
    wi_trans_l = vwhere(choose_reflect, wi_refl_l, wi_refr_l)
    # single-scatter Smith weight G2/G1 (VNDF sampling); refraction tints
    g_ratio = smith_g2(
        fr.alpha, jnp.abs(wo_l.z), jnp.abs(wi_trans_l.z)
    ) / jnp.maximum(smith_g1(fr.alpha, jnp.abs(wo_l.z)), 1e-6)
    w_trans = tuple(
        jnp.where(choose_reflect, g_ratio, a * g_ratio)
        for a in (mat.albedo_r, mat.albedo_g, mat.albedo_b)
    )
    transmitted = mat.translucent & ~choose_reflect & ~mat.thin_walled

    is_trans = mat.translucent
    wi_l = vwhere(is_trans, wi_trans_l, wi_l)
    weight = tuple(jnp.where(is_trans, wt, wo_) for wt, wo_ in zip(w_trans, w_opaque))
    pdf_out = jnp.where(is_trans, 0.0, pdf)
    # Guard degenerate samples (zero-length wi on fully masked lanes).
    wl2 = wi_l.x * wi_l.x + wi_l.y * wi_l.y + wi_l.z * wi_l.z
    degen = wl2 < 1e-16
    wi_l = vwhere(degen, Vec3.of(0.0, 0.0, 1.0, like=wi_l), wi_l)
    wi = _to_world(fr, normalize(wi_l))
    return wi, weight, pdf_out, is_trans, transmitted
