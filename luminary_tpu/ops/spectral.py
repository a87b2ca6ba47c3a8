"""Spectral rendering support: CIE sampling, RGB uplift, hero wavelengths.

TPU re-design of the reference's spectral pipeline (reference:
src/luminary/device/cuda/spectral.cuh:1-64 — CIE1931 CDF wavelength
sampling + XYZ reconstruction LUTs; sky.cuh:11-24 — 8-wavelength
atmosphere). Design differences, on purpose:

  * Hero-wavelength with C = 3 rotations mapped onto the integrator's
    existing RGB triple: the (r, g, b) throughput/radiance slots carry the
    three wavelengths' quantities, so the whole wavefront algebra is reused
    unchanged; the sample ends with one per-lane spectral→RGB resolve.
  * CIE curves are the Wyman et al. 2013 multi-lobe Gaussian fits
    (analytic — no embedded LUT files); wavelength importance is the
    luminance-favoring (x̄+ȳ+z̄) CDF, inverted into a 256-entry table at
    import time (numpy, microseconds).
  * RGB → spectral uplift is a normalized 3-bump partition of unity
    (white → flat 1 exactly); XYZ → sRGB applies an equal-energy
    white-point correction so a flat spectrum resolves to RGB (1,1,1) —
    keeping spectral and RGB renders of neutral scenes consistent.
  * Dispersive refraction collapses to the hero wavelength (slots 1/2
    zeroed, hero scaled by C — the standard unbiased hero-λ collapse).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LAMBDA_MIN = 380.0
LAMBDA_MAX = 720.0
_C = 3  # hero rotations = the integrator's channel count

# 8-wavelength sky bands (reference sky.cuh low/high spectral halves).
SKY_BANDS = np.linspace(400.0, 700.0, 8).astype(np.float32)


def _gauss(x, alpha, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    return alpha * np.exp(-0.5 * ((x - mu) / s) ** 2)


def cie_xyz_np(lam: np.ndarray):
    """CIE 1931 2° observer, Wyman et al. 2013 multi-lobe Gaussian fits."""
    lam = np.asarray(lam, np.float64)
    x = (_gauss(lam, 1.056, 599.8, 37.9, 31.0)
         + _gauss(lam, 0.362, 442.0, 16.0, 26.7)
         + _gauss(lam, -0.065, 501.1, 20.4, 26.2))
    y = (_gauss(lam, 0.821, 568.8, 46.9, 40.5)
         + _gauss(lam, 0.286, 530.9, 16.3, 31.1))
    z = (_gauss(lam, 1.217, 437.0, 11.8, 36.0)
         + _gauss(lam, 0.681, 459.0, 26.0, 13.8))
    return x, y, z


def _gauss_j(x, alpha, mu, s1, s2):
    s = jnp.where(x < mu, s1, s2)
    return alpha * jnp.exp(-0.5 * ((x - mu) / s) ** 2)


def cie_xyz(lam):
    """jnp version of cie_xyz_np (per-lane λ arrays)."""
    x = (_gauss_j(lam, 1.056, 599.8, 37.9, 31.0)
         + _gauss_j(lam, 0.362, 442.0, 16.0, 26.7)
         + _gauss_j(lam, -0.065, 501.1, 20.4, 26.2))
    y = (_gauss_j(lam, 0.821, 568.8, 46.9, 40.5)
         + _gauss_j(lam, 0.286, 530.9, 16.3, 31.1))
    z = (_gauss_j(lam, 1.217, 437.0, 11.8, 36.0)
         + _gauss_j(lam, 0.681, 459.0, 26.0, 13.8))
    return x, y, z


# ---- wavelength sampling: p(λ) ∝ x̄+ȳ+z̄, inverted CDF table ----
_N_CDF = 256
_lam_grid = np.linspace(LAMBDA_MIN, LAMBDA_MAX, _N_CDF)
_xg, _yg, _zg = cie_xyz_np(_lam_grid)
_wg = np.maximum(_xg + _yg + _zg, 1e-6)
_cdf = np.concatenate([[0.0], np.cumsum(_wg[:-1] + _wg[1:])])
_cdf /= _cdf[-1]
# inverse CDF: λ at 256 uniform u values
_INV_CDF = np.interp(np.linspace(0.0, 1.0, _N_CDF), _cdf, _lam_grid).astype(
    np.float32)
# pdf normalization: ∫ w dλ
_trapz = getattr(np, "trapezoid", np.trapz)
_W_INT = float(_trapz(_wg, _lam_grid))
# equal-energy white correction: a flat spectrum must resolve to RGB 1
_XYZ_FLAT = np.asarray([
    _trapz(_xg, _lam_grid),
    _trapz(_yg, _lam_grid),
    _trapz(_zg, _lam_grid),
])

_XYZ2SRGB = np.asarray([
    [3.2406, -1.5372, -0.4986],
    [-0.9689, 1.8758, 0.0415],
    [0.0557, -0.2040, 1.0570],
])
_D65_XYZ = np.asarray([0.95047, 1.0, 1.08883])
# fold the white correction in: flat spectrum → XYZ_FLAT → scaled to the
# sRGB white point → exactly RGB (1, 1, 1). NB: module-level state stays
# PURE NUMPY — this module may first be imported inside a jit trace.
_M_RESOLVE = (_XYZ2SRGB @ np.diag(_D65_XYZ / _XYZ_FLAT)).astype(np.float32)


def wavelength_pdf(lam):
    """p(λ) of the CIE-importance sampler (per nm)."""
    x, y, z = cie_xyz(lam)
    return (x + y + z) / _W_INT


def sample_hero_wavelengths(u):
    """u ∈ [0,1) [N] → three rotated wavelengths (hero first) + pdfs.

    Rotations happen in CDF space (reference spectral.cuh samples one λ per
    path from the CIE CDF; hero rotation is the standard C-wavelength
    extension), so every slot is identically CIE-distributed.
    """
    lams = []
    pdfs = []
    for j in range(_C):
        uj = jnp.mod(u + j / _C, 1.0)
        f = uj * (_N_CDF - 1)
        i0 = jnp.clip(f.astype(jnp.int32), 0, _N_CDF - 2)
        w = f - i0
        inv = jnp.asarray(_INV_CDF)
        lam = inv[i0] * (1.0 - w) + inv[i0 + 1] * w
        lams.append(lam)
        pdfs.append(wavelength_pdf(lam))
    return tuple(lams), tuple(pdfs)


def _basis_np(lam):
    lam = np.asarray(lam, np.float64)
    wr = np.exp(-0.5 * ((lam - 612.0) / 58.0) ** 2) + 0.22 * (lam > 690.0)
    wg = np.exp(-0.5 * ((lam - 549.0) / 45.0) ** 2)
    wb = np.exp(-0.5 * ((lam - 465.0) / 42.0) ** 2) + 0.22 * (lam < 405.0)
    tot = np.maximum(wr + wg + wb, 1e-9)
    return wr / tot, wg / tot, wb / tot


def _roundtrip_matrix():
    """T[c, i] = RGB channel c resolved from the normalized basis i under
    CIE-importance integration — inverted so uplift→resolve round-trips
    RGB colors instead of desaturating them."""
    br, bg, bb = _basis_np(_lam_grid)
    m = _M_RESOLVE
    xyz = np.stack([_xg, _yg, _zg])          # [3, L]
    resp = m @ xyz                           # [3 rgb, L]
    t = np.stack([
        [_trapz(resp[c] * basis, _lam_grid) for basis in (br, bg, bb)]
        for c in range(3)
    ])
    return np.linalg.inv(t)


_UPLIFT_CORR = _roundtrip_matrix().astype(np.float32)


def uplift(r, g, b, lam):
    """RGB → spectral reflectance at λ: round-trip-corrected 3-bump
    partition of unity (white → flat 1; primaries resolve back to
    themselves; negative lobes of out-of-gamut spectra are clamped)."""
    c = _UPLIFT_CORR
    r2 = c[0, 0] * r + c[0, 1] * g + c[0, 2] * b
    g2 = c[1, 0] * r + c[1, 1] * g + c[1, 2] * b
    b2 = c[2, 0] * r + c[2, 1] * g + c[2, 2] * b
    wr = jnp.exp(-0.5 * ((lam - 612.0) / 58.0) ** 2) + 0.22 * (lam > 690.0)
    wg = jnp.exp(-0.5 * ((lam - 549.0) / 45.0) ** 2)
    wb = jnp.exp(-0.5 * ((lam - 465.0) / 42.0) ** 2) + 0.22 * (lam < 405.0)
    tot = jnp.maximum(wr + wg + wb, 1e-9)
    return jnp.maximum((r2 * wr + g2 * wg + b2 * wb) / tot, 0.0)


def resolve_to_rgb(l0, l1, l2, lam3, pdf3):
    """Per-lane spectral radiance (3 hero slots) → linear sRGB.

    L_rgb = Σ_j M·(x̄ȳz̄)(λ_j) · L_j / (C · p(λ_j)); M folds the XYZ→sRGB
    matrix and the equal-energy white normalization.
    """
    out_r = 0.0
    out_g = 0.0
    out_b = 0.0
    for lj, lamj, pj in zip((l0, l1, l2), lam3, pdf3):
        x, y, z = cie_xyz(lamj)
        s = lj / (_C * jnp.maximum(pj, 1e-9))
        out_r = out_r + (_M_RESOLVE[0, 0] * x + _M_RESOLVE[0, 1] * y
                         + _M_RESOLVE[0, 2] * z) * s
        out_g = out_g + (_M_RESOLVE[1, 0] * x + _M_RESOLVE[1, 1] * y
                         + _M_RESOLVE[1, 2] * z) * s
        out_b = out_b + (_M_RESOLVE[2, 0] * x + _M_RESOLVE[2, 1] * y
                         + _M_RESOLVE[2, 2] * z) * s
    return out_r, out_g, out_b


def cauchy_ior(n_d, lam, abbe):
    """Dispersive IOR n(λ) from the d-line index and Abbe number
    (reference: camera_physical.cuh Abbe dispersion). abbe <= 0 → no
    dispersion."""
    lam_um2 = (lam * 1e-3) ** 2
    # Cauchy B from Vd = (n_d - 1) / (n_F - n_C)
    b = jnp.where(
        abbe > 0.0,
        (n_d - 1.0) / jnp.maximum(abbe, 1e-3)
        / (1.0 / 0.48613**2 - 1.0 / 0.65627**2),
        0.0,
    )
    return n_d + b * (1.0 / lam_um2 - 1.0 / 0.5876**2)


def sample_spectrum_bands(bands_lo_hi, lam):
    """Linear interpolation of an 8-band spectrum at λ.

    bands_lo_hi: [..., 8] band values at SKY_BANDS centers.
    """
    t = (lam - SKY_BANDS[0]) / (SKY_BANDS[-1] - SKY_BANDS[0]) * 7.0
    t = jnp.clip(t, 0.0, 7.0 - 1e-4)
    i0 = t.astype(jnp.int32)
    w = t - i0.astype(jnp.float32)
    # one-hot band mix instead of a minor-axis gather (8 selects — cheap on
    # TPU; take_along_axis on [N, 8] would pad/gather per lane)
    k = jnp.arange(8, dtype=jnp.int32)
    w0 = jnp.where(k[None, :] == i0[..., None], 1.0 - w[..., None], 0.0)
    w1 = jnp.where(k[None, :] == (i0 + 1)[..., None], w[..., None], 0.0)
    return jnp.sum(bands_lo_hi * (w0 + w1), axis=-1)


# ---- 8-band physical spectra for the sky bake ----
def rayleigh_beta_bands() -> np.ndarray:
    """β_rayleigh(λ) per band (km^-1), λ^-4 anchored to the RGB constant at
    440 nm (ops/atmosphere.py BETA_RAYLEIGH blue channel)."""
    return (33.1e-3 * (440.0 / SKY_BANDS) ** 4).astype(np.float32)


def ozone_beta_bands() -> np.ndarray:
    """Chappuis-band ozone absorption (km^-1), Gaussian fit anchored to the
    RGB constants (peak ~600 nm)."""
    return (2.0e-3 * np.exp(-0.5 * ((SKY_BANDS - 594.0) / 55.0) ** 2)
            ).astype(np.float32)


def sun_irradiance_bands() -> np.ndarray:
    """Relative solar spectral irradiance per band (normalized so the
    CIE-weighted resolve of the flat-calibrated pipeline keeps the RGB
    exposure scale): 5778 K blackbody shape."""
    lam_m = SKY_BANDS * 1e-9
    h, c, kb, t = 6.626e-34, 2.998e8, 1.381e-23, 5778.0
    planck = 1.0 / (lam_m**5 * (np.exp(h * c / (lam_m * kb * t)) - 1.0))
    return (planck / planck.mean()).astype(np.float32)
