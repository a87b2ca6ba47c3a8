"""IO tests: PNG round-trip, OBJ/MTL parsing, .lum v4 parsing (reference
formats: src/luminary/host/{png.c,wavefront.c,lum_v4.c})."""

import os
import textwrap

import numpy as np
import pytest

from luminary_tpu.io import (
    parse_lum,
    read_lum_file,
    read_obj_file,
    read_png,
    write_lum_file,
    write_png,
)
from luminary_tpu.scene import SkyMode, ToneMap


def test_png_roundtrip_rgb(tmp_path):
    img = (np.random.default_rng(1).random((33, 47, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def test_png_roundtrip_rgba_float(tmp_path):
    img = np.random.default_rng(2).random((16, 16, 4)).astype(np.float32)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    assert back.shape == (16, 16, 4)
    assert np.max(np.abs(back.astype(np.float32) / 255.0 - img)) < 1.0 / 254.0


OBJ_TEXT = """
# test cube corner
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl glow
f 1 3 4
"""

MTL_TEXT = """
newmtl red
Kd 0.8 0.1 0.1
Ns 250
newmtl glow
Kd 0 0 0
Ke 5 4 3
"""


@pytest.fixture
def obj_file(tmp_path):
    (tmp_path / "test.mtl").write_text(MTL_TEXT)
    p = tmp_path / "test.obj"
    p.write_text(OBJ_TEXT)
    return str(p)


def test_obj_parse(obj_file):
    res = read_obj_file(obj_file)
    # quad fans into 2 tris + 1 extra tri
    assert res.mesh.num_triangles == 3
    assert res.mesh.num_vertices == 4
    assert len(res.materials) == 2
    assert res.materials[0].albedo[:3] == (0.8, 0.1, 0.1)
    assert res.materials[1].emission_active
    assert res.materials[1].emission == (5.0, 4.0, 3.0)
    # material slots per triangle
    assert list(res.mesh.material_ids) == [0, 0, 1]
    # uvs resolved on the quad triangles
    assert np.allclose(res.mesh.uvs[0][0], [0, 0])
    assert np.allclose(res.mesh.uvs[0][1], [1, 0])
    # explicit normals used
    assert np.allclose(res.mesh.normals[0], [[0, 0, 1]] * 3)


def test_obj_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    res = read_obj_file(str(p))
    assert res.mesh.num_triangles == 1
    assert list(res.mesh.triangles[0]) == [0, 1, 2]


LUM_TEXT = """Luminary
VERSION 4
# comment line
GENERAL WIDTH___ 640
GENERAL HEIGHT__ 360
GENERAL BOUNCES_ 3
GENERAL MESHFILE box.obj
CAMERA POSITION 1.0 2.0 3.0
CAMERA ROTATION 0.1 0.2 0.3
CAMERA FOV_____ 0.8
CAMERA TONEMAP_ 1
SKY MODE____ 2
SKY COLORCON 0.5 0.6 0.7
SKY ALTITUDE 0.25
OCEAN ACTIVE__ 1
OCEAN HEIGHT__ 2.5
FOG ACTIVE__ 1
FOG DENSITY_ 0.5
PARTICLE COUNT___ 123
CLOUD ACTIVE__ 1
CLOUD LOWCOVER 1.5 0.5
TOY ACTIVE__ 1
"""


def test_lum_parse():
    c = parse_lum(LUM_TEXT, base_dir="/scenes")
    assert c.settings.width == 640
    assert c.settings.height == 360
    assert c.settings.max_ray_depth == 3
    assert c.obj_file_paths == [os.path.join("/scenes", "box.obj")]
    assert len(c.instances) == 1 and c.instances[0].mesh_id == 0
    assert c.camera.pos == (1.0, 2.0, 3.0)
    assert c.camera.tonemap == ToneMap.ACES
    assert c.sky.mode == SkyMode.CONSTANT_COLOR
    assert c.sky.constant_color == (0.5, 0.6, 0.7)
    assert c.sky.altitude == 0.25
    assert c.ocean.active and c.ocean.height == 2.5
    assert c.fog.active and c.fog.density == 0.5
    assert c.particles.count == 123
    assert c.cloud.active
    assert c.cloud.low.coverage == 1.5 and c.cloud.low.coverage_min == 0.5


def test_lum_reference_example_parses():
    # The reference's shipping Example.lum (legacy v4 keys) must parse.
    path = "/root/reference/Example.lum"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    c = read_lum_file(path)
    assert c.settings.width == 1920
    assert c.settings.height == 1080
    assert c.settings.max_ray_depth == 5
    assert len(c.obj_file_paths) == 1
    assert c.sky.azimuth == pytest.approx(3.141)


def test_lum_write_roundtrip(tmp_path):
    c = parse_lum(LUM_TEXT, base_dir=str(tmp_path))
    # flip the round-3 estimator/tier toggles off their defaults so the
    # round-trip proves they persist (GENERAL AMBIENTN/SUNRIS__/SPECTRAL/
    # AERIALPE, OCEAN TESSELLA/CAUSRISS, PARTICLE PHASEDIA)
    c.settings.ambient_nee = False
    c.settings.sun_ris = False
    c.settings.spectral_rendering = True
    c.settings.aerial_perspective = False
    c.ocean.tessellated = True
    c.ocean.caustics_ris_sample_count = 12
    c.particles.phase_diameter = 7.5
    p = str(tmp_path / "out.lum")
    write_lum_file(p, c)
    c2 = read_lum_file(p)
    assert c2.settings.width == c.settings.width
    assert c2.camera.pos == c.camera.pos
    assert c2.sky.constant_color == c.sky.constant_color
    assert c2.ocean.height == c.ocean.height
    assert c2.cloud.low.coverage == c.cloud.low.coverage
    assert c2.settings.ambient_nee is False
    assert c2.settings.sun_ris is False
    assert c2.settings.spectral_rendering is True
    assert c2.settings.aerial_perspective is False
    assert c2.ocean.tessellated is True
    assert c2.ocean.caustics_ris_sample_count == 12
    assert c2.particles.phase_diameter == pytest.approx(7.5)


def test_lum_rejects_garbage():
    from luminary_tpu.utils.errors import FileIOError

    with pytest.raises(FileIOError):
        parse_lum("not a lum file\n")


# ---- QOI (reference: host/qoi.c vendored decoder) ----


def test_qoi_roundtrip(tmp_path):
    from luminary_tpu.io.qoi import read_qoi, write_qoi

    rng = np.random.default_rng(3)
    # mix of runs, small diffs, and random pixels to hit every op type
    img = np.zeros((17, 23, 4), np.uint8)
    img[:5] = (10, 20, 30, 255)
    img[5:9] = rng.integers(0, 255, (4, 23, 4), dtype=np.uint8)
    base = rng.integers(50, 200, 4, dtype=np.uint8)
    for x in range(23):
        img[9:, x] = ((base.astype(np.int32) + x) % 256).astype(np.uint8)
    p = str(tmp_path / "t.qoi")
    write_qoi(p, img)
    back = read_qoi(p)
    assert back.shape == img.shape
    np.testing.assert_array_equal(back, img)


def test_qoi_rgb_channels(tmp_path):
    from luminary_tpu.io.qoi import decode_qoi, encode_qoi

    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    back = decode_qoi(encode_qoi(img))
    np.testing.assert_array_equal(back, img)


def test_qoi_rejects_garbage():
    import pytest as _pytest

    from luminary_tpu.io.qoi import decode_qoi
    from luminary_tpu.utils.errors import FileIOError

    with _pytest.raises(FileIOError):
        decode_qoi(b"nope")
