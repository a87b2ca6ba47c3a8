"""Real spherical harmonics: projection (host) + evaluation (device).

Used for the baked sky: on TPU a bilinear env-map fetch is a full-table scan
per lane (gathers lower to O(N·table) selects), while an SH-6 evaluation is
~200 registers-only flops — so the smooth sky (solar disc excluded) lives in
SH coefficients. Ringing from the horizon discontinuity is tamed with a
Hanning window over degree.
"""

from __future__ import annotations

import numpy as np

L_MAX = 6  # 49 coefficients per channel


def _sh_basis(xyz, xp):
    """All real SH basis values up to L_MAX for unit direction components
    (x, y, z) — a tuple of same-shaped arrays.

    Works for numpy (projection) and jax.numpy (evaluation): pass the module.
    Returns list of [...]-shaped arrays, length (L_MAX+1)^2, ordered (l, m).
    """
    x, y, z = xyz
    out = []
    # Associated Legendre via recurrence on z; azimuth via complex powers of
    # (x + iy) built incrementally as (cos mφ sin^m θ, sin mφ sin^m θ).
    # c_m = Re[(x+iy)^m], s_m = Im[(x+iy)^m] — note these absorb sin^m θ.
    c = [xp.ones_like(z)]
    s = [xp.zeros_like(z)]
    for m in range(1, L_MAX + 1):
        c.append(c[-1] * x - s[-1] * y)
        s.append(s[-1] * x + c[-1] * y)

    # P̄_l^m(z) scaled so that Y_lm = N * P * {c_m | s_m}; use the standard
    # stable recurrence for semi-normalized ALPs (Schmidt-like with explicit
    # normalization constants).
    from math import factorial, pi, sqrt

    def K(l, m):
        return sqrt((2 * l + 1) / (4 * pi) * factorial(l - m) / factorial(l + m))

    # P_m^m(z) with the sin^m θ factor REMOVED (it lives in c_m/s_m):
    # P_m^m = (-1)^m (2m-1)!! sin^m θ  →  reduced p_mm = (-1)^m (2m-1)!!
    for l in range(0, L_MAX + 1):
        pass
    # Build reduced ALPs p[l][m] where true P_l^m = p[l][m] * sin^m θ.
    p = [[None] * (L_MAX + 1) for _ in range(L_MAX + 1)]
    for m in range(0, L_MAX + 1):
        dbl = 1.0
        for k in range(1, m + 1):
            dbl *= 2 * k - 1
        p[m][m] = xp.full_like(z, ((-1.0) ** m) * dbl)
        if m + 1 <= L_MAX:
            p[m + 1][m] = (2 * m + 1) * z * p[m][m]
        for l in range(m + 2, L_MAX + 1):
            p[l][m] = ((2 * l - 1) * z * p[l - 1][m] - (l + m - 1) * p[l - 2][m]) / (
                l - m
            )

    sqrt2 = sqrt(2.0)
    for l in range(0, L_MAX + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            base = K(l, am) * p[l][am]
            if m == 0:
                out.append(base)
            elif m > 0:
                out.append(sqrt2 * base * c[am])
            else:
                out.append(sqrt2 * base * s[am])
    return out


def project_envmap_sh(env: np.ndarray) -> np.ndarray:
    """Project a lat-long env map [H, W, 3] → SH coeffs [(L+1)², 3] with a
    Hanning window over degree to suppress horizon ringing."""
    h, w, _ = env.shape
    theta = (np.arange(h) + 0.5) / h * np.pi
    phi = (np.arange(w) + 0.5) / w * 2.0 * np.pi
    st = np.sin(theta)[:, None]
    dirs = np.stack(
        [
            np.broadcast_to(st * np.cos(phi)[None, :], (h, w)),
            np.broadcast_to(np.cos(theta)[:, None], (h, w)),
            np.broadcast_to(st * np.sin(phi)[None, :], (h, w)),
        ],
        axis=-1,
    )
    d_omega = (np.pi / h) * (2.0 * np.pi / w) * st  # [h,1]
    weights = np.broadcast_to(d_omega, (h, w))[..., None]  # [h,w,1]

    basis = _sh_basis((dirs[..., 0], dirs[..., 1], dirs[..., 2]), np)
    n_coeff = len(basis)
    coeffs = np.zeros((n_coeff, 3), np.float32)
    for i, b in enumerate(basis):
        coeffs[i] = (env * b[..., None] * weights).sum(axis=(0, 1))

    # Hanning window per degree l
    idx = 0
    for l in range(0, L_MAX + 1):
        win = 0.5 * (1.0 + np.cos(np.pi * l / (L_MAX + 1)))
        for m in range(-l, l + 1):
            coeffs[idx] *= win
            idx += 1
    return coeffs


def eval_sh_components(coeffs, x, y, z, xp):
    """Evaluate SH radiance for unit direction components → (r, g, b)
    channel arrays (clamped ≥ 0). Component-SoA form for the hot path."""
    basis = _sh_basis((x, y, z), xp)
    r = g = b = 0.0
    for i, bas in enumerate(basis):
        r = r + coeffs[i, 0] * bas
        g = g + coeffs[i, 1] * bas
        b = b + coeffs[i, 2] * bas
    zero = xp.zeros_like(r)
    return (
        xp.maximum(r, zero),
        xp.maximum(g, zero),
        xp.maximum(b, zero),
    )


def eval_sh(coeffs, dirs, xp):
    """Evaluate SH radiance for unit dirs [..., 3] → [..., 3] (clamped ≥ 0)."""
    r, g, b = eval_sh_components(
        coeffs, dirs[..., 0], dirs[..., 1], dirs[..., 2], xp
    )
    return xp.stack([r, g, b], axis=-1)
