"""Async host mode tests (reference architecture: host worker threads,
non-blocking API, worker introspection — host/host.c, host.h:46-70)."""

import time

import numpy as np
import pytest

from luminary_tpu.host.host import Host, OUTPUT_HANDLE_INVALID

OBJ = "v -2 0 -2\nv 2 0 -2\nv 2 0 2\nv -2 0 2\nf 1 2 3 4\n"


@pytest.fixture
def obj_file(tmp_path):
    p = tmp_path / "plane.obj"
    p.write_text(OBJ)
    return str(p)


def test_async_render_flow(obj_file):
    host = Host(asynchronous=True, samples_per_step=8)
    try:
        host.load_obj_file(obj_file)
        s = host.get_settings()
        s.width = s.height = 16
        s.max_ray_depth = 2
        host.set_settings(s)
        # constant-color sky: skips the sky bake + aerial/env-NEE/sun-RIS
        # compile paths — this test gates the async plumbing, not the
        # integrator, and the full DEFAULT-sky program now compiles in
        # ~170 s on a cold CPU process (no XLA:CPU persistent cache)
        from luminary_tpu.scene.entities import SkyMode

        sky = host.get_sky()
        sky.mode = SkyMode.CONSTANT_COLOR
        sky.constant_color = (0.4, 0.5, 0.6)
        host.set_sky(sky)

        promise = host.request_output(sample_count=8)
        handle = OUTPUT_HANDLE_INVALID
        deadline = time.monotonic() + 240
        while handle == OUTPUT_HANDLE_INVALID and time.monotonic() < deadline:
            handle = host.try_await_output(promise)
            time.sleep(0.02)
        assert handle != OUTPUT_HANDLE_INVALID, "async render never completed"
        img = host.get_image(handle)
        assert img.shape == (16, 16, 3)
        assert host.get_image_meta(handle)["sample_count"] >= 8
    finally:
        host.destroy()


def test_async_lum_load(tmp_path, obj_file):
    lum = tmp_path / "s.lum"
    lum.write_text(
        "Luminary\nVERSION 4\nGENERAL WIDTH___ 16\nGENERAL HEIGHT__ 16\n"
        "GENERAL BOUNCES_ 2\nGENERAL MESHFILE plane.obj\n"
    )
    host = Host(asynchronous=True)
    try:
        assert host.load_lum_file(str(lum)) is None  # queued
        deadline = time.monotonic() + 30
        while host.num_meshes == 0 and time.monotonic() < deadline:
            host.check_errors()
            time.sleep(0.01)
        assert host.num_meshes == 1
    finally:
        host.destroy()


def test_worker_introspection(obj_file):
    host = Host(asynchronous=True)
    try:
        assert host.num_queue_workers >= 2
        names = [host.get_queue_worker_name(i) for i in range(host.num_queue_workers)]
        assert "Host Main Worker" in names
        assert "Device Worker" in names
        assert host.get_queue_worker_time(0) == 0.0  # idle
    finally:
        host.destroy()


def test_sync_mode_unaffected(obj_file):
    host = Host()
    host.load_obj_file(obj_file)
    assert host.num_meshes == 1
    assert host.num_queue_workers == 0


def test_undersampling_pyramid_and_recurring_output():
    """The async loop walks the preview pyramid (coarse→fine) before full
    samples, and acquire_output snapshots progress at any time."""
    import numpy as np

    from luminary_tpu.testing import cornell_scene

    host = Host(asynchronous=True, samples_per_step=1)
    try:
        host.scene = cornell_scene(32, 32, max_depth=2)
        s = host.get_settings()
        s.undersampling = 3  # pyramid: stride 4 → 2 → full
        host.set_settings(s)
        host.request_output(sample_count=4)
        # generous: under full-suite CPU contention the preview + full
        # configs can take minutes to compile
        deadline = time.monotonic() + 300
        seen_preview = False
        while time.monotonic() < deadline:
            h = host.acquire_output()
            img = host.get_image(h)
            meta = host.get_image_meta(h)
            host.release_output(h)
            assert img.shape[0] == 32 and np.isfinite(img).all()
            if meta["sample_count"] == 0:
                seen_preview = True
            if meta["sample_count"] >= 4:
                break
            time.sleep(0.02)
        assert meta["sample_count"] >= 4
        # preview frames may race by; the pyramid state must have run
        assert seen_preview or host.renderer._preview is not None
    finally:
        host.destroy()


def test_viewer_halfblock_rendering():
    import numpy as np

    from luminary_tpu.frontend.viewer import _image_to_halfblocks

    img = np.zeros((16, 16, 3), np.uint8)
    img[:8] = [255, 0, 0]
    img[8:] = [0, 0, 255]
    s = _image_to_halfblocks(img, cols=8, rows=4)
    lines = s.split("\n")
    assert len(lines) == 4
    assert "38;2;255;0;0" in lines[0]  # red top half
    assert "48;2;0;0;255" in lines[3]  # blue bottom half
    assert lines[0].count("▀") == 8
