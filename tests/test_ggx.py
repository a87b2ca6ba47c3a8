"""GGX BSDF, material model, and light-sampling unit tests
(distribution-level probes the reference lacks — SURVEY.md §4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminary_tpu.ops.ggx import (
    fresnel_dielectric,
    ggx_energy_lut,
    ggx_ndf,
    sample_vndf_bounded,
    smith_g1,
    smith_g2,
    vndf_bounded_pdf,
)
from luminary_tpu.ops.lights import build_alias_table
from luminary_tpu.ops.material import (
    LaneMaterial,
    frame_eval,
    make_frame,
    material_eval,
    material_sample,
)
from luminary_tpu.ops.vec import Vec3, normalize, reflect


def make_mat(n, albedo=(0.8, 0.8, 0.8), roughness=0.5, metallic=0.0,
             ior=1.5, translucent=False, thin_walled=False):
    return LaneMaterial(
        albedo_r=jnp.full((n,), albedo[0]),
        albedo_g=jnp.full((n,), albedo[1]),
        albedo_b=jnp.full((n,), albedo[2]),
        roughness=jnp.full((n,), roughness),
        metallic=jnp.full((n,), metallic),
        ior=jnp.full((n,), ior),
        translucent=jnp.full((n,), translucent, bool),
        opacity=jnp.ones((n,)),
        thin_walled=jnp.full((n,), thin_walled, bool),
    )


def vec_tile(xyz, n):
    v = normalize(Vec3(*(jnp.asarray(c, jnp.float32) for c in xyz)))
    return Vec3(
        jnp.broadcast_to(v.x, (n,)),
        jnp.broadcast_to(v.y, (n,)),
        jnp.broadcast_to(v.z, (n,)),
    )


def test_fresnel_dielectric_endpoints():
    f0 = float(fresnel_dielectric(jnp.asarray(1.0), jnp.asarray(1.5)))
    assert abs(f0 - 0.04) < 0.001
    fg = float(fresnel_dielectric(jnp.asarray(0.0), jnp.asarray(1.5)))
    assert fg > 0.99
    tir = float(fresnel_dielectric(jnp.asarray(0.2), jnp.asarray(1 / 1.5)))
    assert tir == 1.0


def test_ndf_normalization():
    """∫ D(h) cos_h dω_h = 1 over the hemisphere."""
    for alpha in (0.1, 0.4, 1.0):
        n_t = 256
        theta = (jnp.arange(n_t) + 0.5) / n_t * (jnp.pi / 2)
        d = ggx_ndf(jnp.asarray(alpha), jnp.cos(theta))
        integrand = d * jnp.cos(theta) * jnp.sin(theta)
        total = float(jnp.sum(integrand) * (jnp.pi / 2 / n_t) * 2 * jnp.pi)
        assert abs(total - 1.0) < 0.02, f"alpha={alpha}: {total}"


def test_vndf_sampling_matches_pdf():
    """MC identity + pdf normalization for the bounded-VNDF sampler."""
    n = 200000
    rng = np.random.default_rng(5)
    r2 = jnp.asarray(rng.random((n, 2)).astype(np.float32))
    wo = vec_tile((0.4, 0.0, 0.8), n)
    alpha = jnp.full((n,), 0.3)
    h = sample_vndf_bounded(wo, alpha, r2)
    wi = reflect(-wo, h)
    ok = np.asarray(wi.z > 0)
    pdf = np.asarray(vndf_bounded_pdf(wo, wi, alpha))[ok]
    f = np.asarray(wi.z)[ok] ** 2
    est_sample = (f / pdf).sum() / n
    assert abs(est_sample - 2 * np.pi / 3) < 0.05, est_sample
    # pdf integrates to ~1 over the hemisphere
    nt, npphi = 256, 128
    theta = (np.arange(nt) + 0.5) / nt * np.pi / 2
    phi = (np.arange(npphi) + 0.5) / npphi * 2 * np.pi
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    dx = (np.sin(tt) * np.cos(pp)).reshape(-1)
    dy = (np.sin(tt) * np.sin(pp)).reshape(-1)
    dz = np.cos(tt).reshape(-1)
    m = dx.size
    wo1 = vec_tile((0.4, 0.0, 0.8), m)
    a1 = jnp.full((m,), 0.3)
    dirs = Vec3(jnp.asarray(dx, jnp.float32), jnp.asarray(dy, jnp.float32),
                jnp.asarray(dz, jnp.float32))
    pdf_q = np.asarray(vndf_bounded_pdf(wo1, dirs, a1))
    dw = (np.pi / 2 / nt) * (2 * np.pi / npphi) * np.sin(tt).reshape(-1)
    total = (pdf_q * dw).sum()
    assert abs(total - 1.0) < 0.03, f"pdf integrates to {total}"


def test_energy_lut_monotone_and_bounded():
    lut = np.asarray(ggx_energy_lut())
    assert lut.shape == (32, 32)
    assert np.all(lut > 0) and np.all(lut <= 1.0)
    assert lut[:, 0].min() > 0.95  # smooth surfaces lose almost nothing
    assert lut[0, -1] < lut[-1, 0]  # rough + grazing loses the most


def test_material_sample_eval_consistency():
    """For sampled (non-delta) directions: weight == f/pdf and eval agrees."""
    n = 4096
    mat = make_mat(n, roughness=0.4)
    ns = vec_tile((0.0, 0.0, 1.0), n)
    wo = vec_tile((0.3, 0.1, 0.9), n)
    pid = jnp.arange(n, dtype=jnp.uint32)
    fr = make_frame(mat, ns, wo)
    wi, weight, pdf, is_delta, transmitted = material_sample(
        mat, fr, ns, wo, pid, 3, 1
    )
    f, pdf_e = material_eval(mat, ns, wo, wi)
    ok = np.asarray(pdf > 1e-6) & (np.asarray(wi.z) > 1e-3)
    for c in range(3):
        w = np.asarray(weight[c])[ok]
        w2 = np.asarray(f[c])[ok] / np.asarray(pdf_e)[ok]
        assert np.allclose(w, w2, rtol=0.05, atol=1e-3)
    assert not np.any(np.asarray(is_delta))


def test_material_white_furnace():
    """Rough white opaque material under uniform unit environment ≈ albedo."""
    n = 65536
    mat = make_mat(n, albedo=(1.0, 1.0, 1.0), roughness=0.9)
    ns = vec_tile((0.0, 0.0, 1.0), n)
    wo = vec_tile((0.0, 0.4, 0.9), n)
    pid = jnp.arange(n, dtype=jnp.uint32)
    fr = make_frame(mat, ns, wo)
    wi, weight, pdf, is_delta, _ = material_sample(mat, fr, ns, wo, pid, 0, 0)
    alb = float(jnp.mean(weight[0]))
    assert 0.85 < alb <= 1.1, alb


def test_metallic_reflects_tinted():
    n = 8192
    mat = make_mat(n, albedo=(0.9, 0.5, 0.1), roughness=0.3, metallic=1.0)
    ns = vec_tile((0.0, 0.0, 1.0), n)
    wo = vec_tile((0.0, 0.0, 1.0), n)
    pid = jnp.arange(n, dtype=jnp.uint32)
    fr = make_frame(mat, ns, wo)
    wi, weight, pdf, is_delta, _ = material_sample(mat, fr, ns, wo, pid, 0, 0)
    w = [float(jnp.mean(weight[c])) for c in range(3)]
    assert w[0] > w[1] > w[2]  # tint preserved


def test_translucent_delta_refracts():
    n = 1024
    # roughness 0 clamps to MIN_ROUGHNESS: near-delta rough dielectric
    mat = make_mat(n, translucent=True, ior=1.5, albedo=(1, 1, 1),
                   roughness=0.0)
    ns = vec_tile((0.0, 0.0, 1.0), n)
    wo = vec_tile((0.5, 0.0, 0.866), n)
    pid = jnp.arange(n, dtype=jnp.uint32)
    fr = make_frame(mat, ns, wo)
    wi, weight, pdf, is_delta, transmitted = material_sample(
        mat, fr, ns, wo, pid, 0, 0
    )
    assert np.all(np.asarray(is_delta))
    tr = np.asarray(transmitted)
    assert 0.5 < tr.mean() < 1.0  # mostly refraction at this angle
    wiz = np.asarray(wi.z)
    assert np.all(wiz[tr] < 0)
    assert np.all(wiz[~tr] > 0)
    # Snell: sin_t = sin_i / 1.5 for entering rays
    sin_i = 0.5
    sin_t = np.sqrt(np.asarray(wi.x)[tr] ** 2 + np.asarray(wi.y)[tr] ** 2)
    # MIN_ROUGHNESS clamp leaves a small half-vector spread
    assert np.allclose(sin_t, sin_i / 1.5, atol=0.03)
    assert abs(float(sin_t.mean()) - sin_i / 1.5) < 3e-3


def test_alias_table_distribution():
    w = np.asarray([1.0, 2.0, 3.0, 4.0], np.float64)
    prob, alias = build_alias_table(w)
    counts = np.zeros(4)
    steps = 400
    for i in range(4):
        for r in range(steps):
            u = (r + 0.5) / steps
            counts[i if u < prob[i] else alias[i]] += 1.0
    got = counts / counts.sum()
    want = w / w.sum()
    assert np.allclose(got, want, atol=0.01)


def test_smith_g_bounds():
    a = jnp.asarray([0.1, 0.5, 1.0])
    c = jnp.asarray([0.3, 0.7, 0.95])
    g1 = np.asarray(smith_g1(a, c))
    g2 = np.asarray(smith_g2(a, c, c))
    assert np.all((g1 > 0) & (g1 <= 1))
    assert np.all((g2 > 0) & (g2 <= 1))
    assert np.all(g2 <= g1 + 1e-6)
