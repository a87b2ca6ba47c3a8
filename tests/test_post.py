"""Post-processing tests (bloom pyramid, purkinje, grain, color correction)."""

import numpy as np
import jax.numpy as jnp
import pytest

from luminary_tpu.ops.post import (
    apply_bloom,
    apply_color_correction,
    apply_film_grain,
    apply_purkinje,
)
from luminary_tpu.render.renderer import Renderer
from luminary_tpu.testing import cornell_scene


def test_bloom_spreads_bright_spot():
    img = np.zeros((64, 64, 3), np.float32)
    img[32, 32] = 100.0
    out = np.asarray(apply_bloom(jnp.asarray(img), 0.3))
    assert np.all(np.isfinite(out))
    # energy spread: neighbors gain light
    assert out[36, 36].sum() > 0.001
    assert out[32, 32].sum() < img[32, 32].sum()
    # total energy roughly conserved (blend is a lerp)
    assert 0.2 * img.sum() < out.sum() < 1.5 * img.sum()


def test_bloom_zero_blend_identity():
    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    out = np.asarray(apply_bloom(jnp.asarray(img), 0.0))
    assert np.allclose(out, img)


def test_purkinje_blue_shifts_darkness():
    dark = jnp.full((8, 8, 3), 0.001)
    bright = jnp.full((8, 8, 3), 5.0)
    d = np.asarray(apply_purkinje(dark, 0.2, 0.29))
    b = np.asarray(apply_purkinje(bright, 0.2, 0.29))
    assert d[0, 0, 2] > d[0, 0, 0]  # dark regions go blue
    assert np.allclose(b, np.asarray(bright), rtol=0.05)  # bright unaffected


def test_color_correction_gains():
    img = jnp.full((4, 4, 3), 0.25)
    out = np.asarray(apply_color_correction(img, (1.0, 0.0, -1.0)))
    assert out[0, 0, 0] == pytest.approx(1.0)  # +1 → x4
    assert out[0, 0, 1] == pytest.approx(0.25)
    assert out[0, 0, 2] == pytest.approx(0.0625)  # -1 → /4


def test_film_grain_statistics():
    img = jnp.full((32, 32, 3), 0.5)
    out = np.asarray(apply_film_grain(img, 0.2, 0))
    assert abs(out.mean() - 0.5) < 0.01
    assert out.std() > 0.01


def test_render_with_full_post_stack():
    scene = cornell_scene(16, 16, max_depth=2)
    cam = scene.get_entity("camera")
    cam.bloom_blend = 0.1
    cam.purkinje = True
    cam.film_grain = 0.05
    cam.use_color_correction = True
    cam.color_correction = (0.1, 0.0, -0.1)
    scene.set_entity("camera", cam)
    r = Renderer(scene, chunk=256)
    r.render_samples(2)
    img = r.get_image()
    assert img.shape == (16, 16, 3)
    assert np.all(np.isfinite(img.astype(np.float32)))
