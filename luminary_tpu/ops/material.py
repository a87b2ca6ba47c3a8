"""Surface material model: lobe selection, sampling, evaluation.

Maps the reference's material semantics (reference: include/luminary/
structs.h LuminaryMaterial, cuda/bsdf.cuh lobe logic) onto three lobes:

  * metallic → GGX conductor (F0 = albedo), multiscatter-compensated;
  * opaque dielectric → GGX specular coat (F0 from ior) over Lambert diffuse,
    lobe chosen by the Fresnel-weighted probability;
  * translucent → smooth dielectric reflect/refract (delta lobes; rough
    refraction via spherical-cap VNDF is a planned upgrade, reference
    bsdf_utils.cuh:269).

All functions are lane-vectorized; the evaluated value is premultiplied by
|cos θi|. Delta lobes report pdf = 0 and are excluded from MIS.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math3
from .ggx import (
    diffuse_eval,
    fresnel_dielectric,
    ggx_reflect_eval,
    roughness_to_alpha,
    sample_vndf_bounded,
)
from .random import RandomTarget, random_1d, random_2d


class LaneMaterial(NamedTuple):
    """Material parameters gathered per lane."""

    albedo: jnp.ndarray  # f32 [N,3]
    roughness: jnp.ndarray  # f32 [N]
    metallic: jnp.ndarray  # f32 [N] 0/1
    ior: jnp.ndarray  # f32 [N]
    translucent: jnp.ndarray  # bool [N]
    opacity: jnp.ndarray  # f32 [N] albedo alpha


def _f0_from_ior(ior):
    r = (ior - 1.0) / (ior + 1.0)
    return r * r


def _to_local(ns, v):
    t, b = math3.orthonormal_basis(ns)
    return jnp.stack(
        [math3.dot(v, t), math3.dot(v, b), math3.dot(v, ns)], axis=-1
    )


def _to_world(ns, v_l):
    t, b = math3.orthonormal_basis(ns)
    return (
        t * v_l[..., 0:1] + b * v_l[..., 1:2] + ns * v_l[..., 2:3]
    )


def _lobe_params(mat: LaneMaterial):
    """Shared lobe inputs: specular F0 (RGB), diffuse albedo, spec prob."""
    f0_dielectric = _f0_from_ior(mat.ior)[..., None]
    f0 = jnp.where(mat.metallic[..., None] > 0.5, mat.albedo, f0_dielectric)
    kd = mat.albedo * (1.0 - mat.metallic[..., None])
    return f0, kd


def material_eval(mat: LaneMaterial, ns, wo, wi):
    """(f·cos [N,3], pdf [N]) for explicit directions (NEE/MIS).

    Translucent lanes evaluate to zero (delta lobes).
    """
    wo_l = _to_local(ns, wo)
    wi_l = _to_local(ns, wi)
    alpha = roughness_to_alpha(mat.roughness)
    f0, kd = _lobe_params(mat)

    spec, pdf_spec = ggx_reflect_eval(wo_l, wi_l, alpha, f0, mat.roughness)
    diff, pdf_diff = diffuse_eval(wi_l, kd)

    p_spec = _spec_select_prob(mat, wo_l)
    f = spec + diff
    pdf = p_spec * pdf_spec + (1.0 - p_spec) * pdf_diff
    is_delta = mat.translucent
    zero = jnp.zeros_like(f)
    return jnp.where(is_delta[..., None], zero, f), jnp.where(is_delta, 0.0, pdf)


def _spec_select_prob(mat: LaneMaterial, wo_l):
    """Probability of sampling the specular lobe (Fresnel-informed)."""
    f0, kd = _lobe_params(mat)
    cos_o = jnp.clip(wo_l[..., 2], 0.0, 1.0)
    m = (1.0 - cos_o) ** 5
    f_avg = jnp.mean(f0, axis=-1)
    fres = f_avg + (1.0 - f_avg) * m
    kd_lum = jnp.mean(kd, axis=-1)
    p = fres / jnp.maximum(fres + kd_lum * (1.0 - fres), 1e-6)
    p = jnp.where(mat.metallic > 0.5, 1.0, jnp.clip(p, 0.05, 0.95))
    return p


def material_sample(mat: LaneMaterial, ns, ng, wo, pixel_id, sample_id, depth):
    """Sample an outgoing direction.

    Returns (wi [N,3], weight f·cos/pdf [N,3], pdf [N], is_delta [N],
    transmitted [N]). For delta lanes weight already includes everything and
    pdf is reported 0.
    """
    wo_l = _to_local(ns, wo)
    alpha = roughness_to_alpha(mat.roughness)
    f0, kd = _lobe_params(mat)

    r_choice = random_1d(RandomTarget.BSDF_CHOICE, pixel_id, sample_id, depth)
    r2 = random_2d(RandomTarget.BSDF_REFLECTION, pixel_id, sample_id, depth)

    # --- opaque path: specular or diffuse ---
    p_spec = _spec_select_prob(mat, wo_l)
    choose_spec = r_choice < p_spec

    h = sample_vndf_bounded(wo_l, alpha, r2)
    wi_spec_l = math3.reflect(-wo_l, h)
    phi = 2.0 * jnp.pi * r2[..., 0]
    sr = jnp.sqrt(jnp.clip(r2[..., 1], 0.0, 1.0))
    wi_diff_l = jnp.stack(
        [
            jnp.cos(phi) * sr,
            jnp.sin(phi) * sr,
            jnp.sqrt(jnp.maximum(1.0 - r2[..., 1], 0.0)),
        ],
        axis=-1,
    )
    wi_l = jnp.where(choose_spec[..., None], wi_spec_l, wi_diff_l)
    f, pdf = (lambda s, ps, d, pd: (s + d, p_spec * ps + (1.0 - p_spec) * pd))(
        *ggx_reflect_eval(wo_l, wi_l, alpha, f0, mat.roughness),
        *diffuse_eval(wi_l, kd),
    )
    weight_opaque = f / jnp.maximum(pdf, 1e-8)[..., None]
    ok = (wi_l[..., 2] > 0.0) & (pdf > 1e-10)
    weight_opaque = jnp.where(ok[..., None], weight_opaque, 0.0)

    # --- translucent path: smooth dielectric ---
    # Entering vs exiting by the geometric side of wo.
    cos_o = wo_l[..., 2]
    entering = cos_o > 0.0
    eta = jnp.where(entering, mat.ior, 1.0 / mat.ior)  # n_t / n_i
    fres = fresnel_dielectric(jnp.abs(cos_o), eta)
    choose_reflect = r_choice < fres
    n_sign = jnp.where(entering, 1.0, -1.0)
    # mirror reflection about the local normal (z axis)
    wi_refl_l = jnp.stack(
        [-wo_l[..., 0], -wo_l[..., 1], wo_l[..., 2]], axis=-1
    )
    # refraction via Snell in local frame
    inv_eta = 1.0 / eta
    sin2_t = inv_eta**2 * jnp.maximum(1.0 - cos_o**2, 0.0)
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_t, 0.0, 1.0))
    wi_refr_l = jnp.concatenate(
        [
            -wo_l[..., :2] * inv_eta[..., None],
            (-cos_t * n_sign)[..., None],
        ],
        axis=-1,
    )
    wi_trans_l = jnp.where(choose_reflect[..., None], wi_refl_l, wi_refr_l)
    # Colored transmission via albedo on refraction.
    w_refl = jnp.ones_like(mat.albedo)
    w_refr = mat.albedo
    weight_trans = jnp.where(choose_reflect[..., None], w_refl, w_refr)
    transmitted = mat.translucent & ~choose_reflect

    is_trans = mat.translucent
    wi_l = jnp.where(is_trans[..., None], wi_trans_l, wi_l)
    weight = jnp.where(is_trans[..., None], weight_trans, weight_opaque)
    pdf_out = jnp.where(is_trans, 0.0, pdf)
    # Guard degenerate samples (zero-length wi on fully masked lanes).
    wi_len = math3.length(wi_l)
    wi_l = jnp.where(
        (wi_len > 1e-8)[..., None], wi_l, jnp.asarray([0.0, 0.0, 1.0])
    )
    wi = _to_world(ns, math3.normalize(wi_l))
    return wi, weight, pdf_out, is_trans, transmitted
