"""End-to-end render tests (reference's golden-image role, SURVEY.md §4 —
plus the unit coverage the reference lacks)."""

import numpy as np
import pytest

from luminary_tpu.render.renderer import Renderer
from luminary_tpu.scene.entities import ShadingMode
from luminary_tpu.testing import cornell_scene, sun_plane_scene


@pytest.fixture(scope="module")
def cornell_renderer():
    scene = cornell_scene(16, 16, max_depth=4)
    r = Renderer(scene, chunk=256)
    # No area-light NEE yet (light found by BSDF bounces only), so give the
    # estimator enough samples to converge on every wall pixel.
    r.render_samples(192)
    return r


def test_cornell_color_bleed(cornell_renderer):
    rad = cornell_renderer.get_radiance()
    left = rad[8, 1]
    right = rad[8, 14]
    # red wall on the left, green wall on the right
    assert left[0] > 2.0 * left[1], f"left wall not red: {left}"
    assert right[1] > 2.0 * right[0], f"right wall not green: {right}"


def test_cornell_finite_and_lit(cornell_renderer):
    rad = cornell_renderer.get_radiance()
    assert np.all(np.isfinite(rad))
    assert rad.mean() > 0.05
    # ceiling light region should be the brightest area
    lum = rad.mean(axis=-1)
    assert lum[1:3, 6:10].mean() > lum.mean()


def test_gbuffer_pixel_info(cornell_renderer):
    info = cornell_renderer.get_pixel_info(8, 8)
    assert info["pixel_query_is_valid"]
    assert info["instance_id"] == 0
    # back wall at z=-1, camera at z=3.5
    assert 4.0 < info["depth"] < 5.5


def test_image_output_uint8(cornell_renderer):
    img = cornell_renderer.get_image()
    assert img.dtype == np.uint8
    assert img.shape == (16, 16, 3)
    assert img.max() > 30


def test_determinism():
    scene = cornell_scene(16, 16, max_depth=3)
    r1 = Renderer(scene, chunk=256)
    r1.render_samples(2)
    scene2 = cornell_scene(16, 16, max_depth=3)
    r2 = Renderer(scene2, chunk=256)
    r2.render_samples(2)
    assert np.array_equal(r1.get_radiance(), r2.get_radiance())


def test_sun_plane_nee_low_variance():
    scene = sun_plane_scene(16, 16)
    r = Renderer(scene, chunk=256)
    r.render_samples(8)
    rad = r.get_radiance()
    ground = rad[12:, :, :]
    assert ground.mean() > 0.02
    # NEE keeps direct sun lighting smooth: relative std under 50%
    rel = ground[..., 0].std() / ground[..., 0].mean()
    assert rel < 0.5, f"ground too noisy: rel std {rel}"


def test_integration_restart_on_camera_move():
    scene = cornell_scene(16, 16, max_depth=2)
    r = Renderer(scene, chunk=256)
    r.render_samples(2)
    assert r.sample_count == 2
    cam = scene.get_entity("camera")
    cam.pos = (0.1, 1.0, 3.5)
    scene.set_entity("camera", cam)
    r.update()
    assert r.sample_count == 0  # accumulation reset


def test_exposure_change_keeps_accumulation():
    scene = cornell_scene(16, 16, max_depth=2)
    r = Renderer(scene, chunk=256)
    r.render_samples(2)
    cam = scene.get_entity("camera")
    cam.exposure = 2.0
    scene.set_entity("camera", cam)
    r.update()
    assert r.sample_count == 2  # OUTPUT-only change


@pytest.mark.parametrize("mode", [ShadingMode.ALBEDO, ShadingMode.NORMAL, ShadingMode.DEPTH])
def test_debug_shading_modes(mode):
    scene = cornell_scene(16, 16, max_depth=2)
    s = scene.get_entity("settings")
    s.shading_mode = mode
    scene.set_entity("settings", s)
    r = Renderer(scene, chunk=256)
    r.render_samples(1)
    rad = r.get_radiance()
    assert np.all(np.isfinite(rad))
    assert rad.mean() > 0.01
    if mode == ShadingMode.ALBEDO:
        # left wall albedo is red
        assert rad[8, 1, 0] > 0.5 and rad[8, 1, 1] < 0.2


def test_undersampled_preview():
    """render_preview gives a full-size image before any full sample
    (reference: undersampling pyramid, kernels.cuh:19-43)."""
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.testing import cornell_scene

    scene = cornell_scene(64, 64, max_depth=2)
    r = Renderer(scene)
    r.render_preview(2)
    assert r.sample_count == 0
    img = r.get_image()
    assert img.shape == (64, 64, 3)
    assert img.max() > 0  # preview shows the lit box, not black
    # 2^2 block replication: each 4x4 block is constant up to output dither
    blk = img[0:4, 0:4].astype(int)
    assert np.abs(blk - blk[0, 0]).max() <= 2
    # a full sample replaces the preview
    r.render_samples(1)
    assert r.sample_count == 1
