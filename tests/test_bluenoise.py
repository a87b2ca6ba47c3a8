"""Blue-noise sampling tests (reference: cuda/random.cuh blue-noise masks
+ random_2D_base Cranley-Patterson construction)."""

import numpy as np
import jax.numpy as jnp
import pytest

from luminary_tpu.ops.random import (
    RandomTarget,
    blue_base,
    load_bluenoise,
    random_1d,
    random_2d,
)


def test_mask_is_blue_and_uniform():
    bn = load_bluenoise()  # [16, 128, 128] uint32 fixed-point
    assert bn.shape == (16, 128, 128) and bn.dtype == np.uint32
    for c in range(bn.shape[0]):
        v = np.sort(bn[c].ravel().astype(np.float64) / 2**32)
        exp = (np.arange(v.size) + 0.5) / v.size
        assert np.allclose(v, exp, atol=1e-6), "mask is not a rank permutation"
        # thresholded pattern must be high-frequency (blue): low-band power
        # well below high-band power
        b = (bn[c].astype(np.float64) / 2**32 < 0.5).astype(np.float64)
        b -= b.mean()
        p = np.abs(np.fft.fft2(b)) ** 2
        fy = np.fft.fftfreq(128)[:, None]
        fx = np.fft.fftfreq(128)[None, :]
        r = np.sqrt(fy * fy + fx * fx)
        low = p[(r < 0.08) & (r > 0)].mean()
        high = p[r > 0.3].mean()
        assert low < 0.1 * high, (low, high)


def test_blue_draws_are_uniform_and_decorrelated():
    """Marginals stay uniform under the CP rotation; different targets and
    depths decorrelate."""
    n = 128 * 128
    ys, xs = np.meshgrid(np.arange(128), np.arange(128), indexing="ij")
    px = jnp.asarray(xs.ravel(), jnp.uint32)
    py = jnp.asarray(ys.ravel(), jnp.uint32)
    bn = blue_base(px, py)
    pid = py * jnp.uint32(128) + px
    sid = jnp.full((n,), 3, jnp.uint32)

    u = np.asarray(random_2d(RandomTarget.BSDF_REFLECTION, pid, sid, 0, bn=bn))
    assert u.shape == (n, 2)
    assert 0.0 <= u.min() and u.max() < 1.0
    # uniform marginals: mean ~0.5, even decile histogram
    for d in range(2):
        assert abs(u[:, d].mean() - 0.5) < 0.01
        h, _ = np.histogram(u[:, d], bins=10, range=(0, 1))
        assert h.min() > 0.08 * n and h.max() < 0.12 * n
    # a different target decorrelates (correlation ~0)
    v = np.asarray(random_2d(RandomTarget.LIGHT_RIS, pid, sid, 0, bn=bn))
    c = np.corrcoef(u[:, 0], v[:, 0])[0, 1]
    assert abs(c) < 0.05, c
    # a different depth decorrelates
    w = np.asarray(random_2d(RandomTarget.BSDF_REFLECTION, pid, sid, 1, bn=bn))
    c = np.corrcoef(u[:, 0], w[:, 0])[0, 1]
    assert abs(c) < 0.05, c
    # 1d variant agrees with uniformity too
    s = np.asarray(random_1d(RandomTarget.RUSSIAN_ROULETTE, pid, sid, 0, bn=bn))
    assert abs(s.mean() - 0.5) < 0.01


def test_blue_error_is_blue_across_pixels():
    """At 1 sample, the per-pixel error field of a blue-noise draw must have
    LESS low-frequency energy than the white-noise hash draw — the whole
    point of the mask (reference random.cuh blue-noise application)."""
    res = 128
    n = res * res
    ys, xs = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    px = jnp.asarray(xs.ravel(), jnp.uint32)
    py = jnp.asarray(ys.ravel(), jnp.uint32)
    pid = py * jnp.uint32(res) + px
    sid = jnp.zeros((n,), jnp.uint32)
    bn = blue_base(px, py)

    # integrand: a smooth function of the random draw; error = estimate-mean
    def err_field(u):
        f = np.sin(2 * np.pi * np.asarray(u)[:, 0])  # mean 0 over [0,1)
        return f.reshape(res, res)

    e_blue = err_field(random_2d(RandomTarget.BSDF_REFLECTION, pid, sid, 0, bn=bn))
    e_white = err_field(random_2d(RandomTarget.BSDF_REFLECTION, pid, sid, 0))

    def low_band(e):
        e = e - e.mean()
        p = np.abs(np.fft.fft2(e)) ** 2
        fy = np.fft.fftfreq(res)[:, None]
        fx = np.fft.fftfreq(res)[None, :]
        r = np.sqrt(fy * fy + fx * fx)
        return p[(r < 0.08) & (r > 0)].mean()

    lb, lw = low_band(e_blue), low_band(e_white)
    assert lb < 0.25 * lw, (lb, lw)


def test_blue_noise_render_reduces_low_freq_error():
    """End-to-end: the 1-spp ERROR (vs a converged reference) with
    blue_noise=True carries less low-frequency power and a bluer spectrum
    than blue_noise=False. Guards the whole wiring (config -> wavefront ->
    draws). Measured at introduction: blue low/high 0.40 vs white 0.87,
    low-band power -23%."""
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.testing import sun_plane_scene

    res = 64

    def make(flag):
        scene = sun_plane_scene(res, res)
        scene.settings.blue_noise = flag
        return Renderer(scene, chunk=res * res)

    rb = make(True)
    rb.render_samples(1)
    img_b = rb.get_radiance().copy()
    rb.render_samples(96)  # converge the same renderer into the reference
    ref = rb.get_radiance().copy()
    rw = make(False)
    rw.render_samples(1)
    img_w = rw.get_radiance().copy()

    def bands(e):
        e = e - e.mean()
        p = np.abs(np.fft.fft2(e)) ** 2
        fy = np.fft.fftfreq(e.shape[0])[:, None]
        fx = np.fft.fftfreq(e.shape[1])[None, :]
        r = np.sqrt(fy * fy + fx * fx)
        return p[(r < 0.1) & (r > 0)].mean(), p[r > 0.3].mean()

    eb = (img_b - ref)[res // 2:, :, 0]
    ew = (img_w - ref)[res // 2:, :, 0]
    lo_b, hi_b = bands(eb)
    lo_w, hi_w = bands(ew)
    # the blue error spectrum must be materially bluer than the white one
    assert lo_b / hi_b < 0.7 * (lo_w / hi_w), (lo_b / hi_b, lo_w / hi_w)
    # and carry no more low-frequency power in absolute terms
    assert lo_b < 1.05 * lo_w, (lo_b, lo_w)
    assert np.isfinite(img_b).all()
