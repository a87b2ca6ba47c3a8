"""Per-stage profiling + adaptive inspection outputs."""

import numpy as np

from luminary_tpu.scene.entities import AdaptiveSamplingOutputMode
from luminary_tpu.testing import cornell_scene


def test_profile_renderer_reports_stage_groups(tmp_path):
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.utils.profiling import format_breakdown, profile_renderer

    r = Renderer(cornell_scene(16, 16, max_depth=2), chunk=1 << 20)
    rows = profile_renderer(r, samples=1, trace_dir=str(tmp_path))
    assert rows, "no device ops captured"
    total_pct = sum(p for _, _, p in rows)
    assert 99.0 < total_pct < 101.0
    text = format_breakdown(rows)
    assert "stage" in text and "ms" in text


def test_adaptive_output_modes_render_heatmaps():
    from luminary_tpu.render.renderer import Renderer

    scene = cornell_scene(24, 24, max_depth=2)
    r = Renderer(scene, chunk=1 << 20)
    r.render_samples(6)
    for mode in (
        AdaptiveSamplingOutputMode.VARIANCE,
        AdaptiveSamplingOutputMode.ERROR,
        AdaptiveSamplingOutputMode.SAMPLE_DISTRIBUTION,
    ):
        s = scene.get_entity("settings")
        s.adaptive_sampling_output_mode = mode
        scene.set_entity("settings", s)
        img = r.get_image()
        assert img.shape == (24, 24, 3) and img.dtype == np.uint8
        if mode != AdaptiveSamplingOutputMode.SAMPLE_DISTRIBUTION:
            # variance differs across the frame → not a constant image
            assert img.std() > 1.0
    s = scene.get_entity("settings")
    s.adaptive_sampling_output_mode = AdaptiveSamplingOutputMode.BEAUTY
    scene.set_entity("settings", s)
    assert r.get_image().shape == (24, 24, 3)


def test_host_profile_render():
    from luminary_tpu.host.host import Host

    host = Host()
    host.scene = cornell_scene(16, 16, max_depth=2)
    rows = host.profile_render()
    assert rows and abs(sum(p for _, _, p in rows) - 100.0) < 1.0
