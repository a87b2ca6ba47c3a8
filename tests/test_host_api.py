"""Host public API end-to-end (reference: include/luminary/host.h flow)."""

import os

import numpy as np
import pytest

import luminary_tpu as lt
from luminary_tpu.host.host import OUTPUT_HANDLE_INVALID, Host
from luminary_tpu.io.png import read_png

LUM = """Luminary
VERSION 4
GENERAL WIDTH___ 16
GENERAL HEIGHT__ 16
GENERAL BOUNCES_ 2
GENERAL MESHFILE tri.obj
CAMERA POSITION 0.0 0.5 3.0
SKY MODE____ 2
SKY COLORCON 0.2 0.3 0.4
"""

OBJ = """
v -1 0 0
v 1 0 0
v 0 1.5 0
f 1 2 3
"""


@pytest.fixture
def scene_dir(tmp_path):
    (tmp_path / "scene.lum").write_text(LUM)
    (tmp_path / "tri.obj").write_text(OBJ)
    return tmp_path


def test_host_full_flow(scene_dir, tmp_path):
    host = Host(samples_per_step=8)
    host.load_lum_file(str(scene_dir / "scene.lum"))
    assert host.num_meshes == 1
    assert host.num_instances == 1
    assert host.num_materials == 1

    promise = host.request_output(sample_count=4)
    handle = OUTPUT_HANDLE_INVALID
    for _ in range(10):
        handle = host.try_await_output(promise)
        if handle != OUTPUT_HANDLE_INVALID:
            break
    assert handle != OUTPUT_HANDLE_INVALID
    img = host.get_image(handle)
    assert img.shape == (16, 16, 3)
    meta = host.get_image_meta(handle)
    assert meta["sample_count"] >= 4

    png_path = str(tmp_path / "out.png")
    host.save_png(handle, png_path)
    assert read_png(png_path).shape == (16, 16, 3)
    host.release_output(handle)
    with pytest.raises(lt.LuminaryError):
        host.get_image(handle)

    # picking: center pixel hits the triangle
    info = host.get_pixel_info(8, 8)
    assert info["pixel_query_is_valid"]


def test_host_entity_roundtrip(scene_dir):
    host = Host()
    host.load_lum_file(str(scene_dir / "scene.lum"))
    cam = host.get_camera()
    assert cam.pos == (0.0, 0.5, 3.0)
    cam.exposure = 3.0
    host.set_camera(cam)
    assert host.get_camera().exposure == 3.0

    sky = host.get_sky()
    assert sky.constant_color == (0.2, 0.3, 0.4)

    mat = host.get_material(0)
    mat.roughness = 0.25
    host.set_material(mat)
    assert host.get_material(0).roughness == 0.25


def test_host_new_instance(scene_dir):
    host = Host()
    host.load_lum_file(str(scene_dir / "scene.lum"))
    inst = host.new_instance()
    inst.mesh_id = 0
    inst.position = (2.0, 0.0, 0.0)
    host.set_instance(inst)
    assert host.num_instances == 2
    assert host.get_instance(inst.id).position == (2.0, 0.0, 0.0)


def test_host_device_info():
    host = Host()
    assert host.get_device_count() >= 1
    info = host.get_device_info(0)
    assert info["is_main_device"]
    assert "name" in info
