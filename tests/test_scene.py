"""Scene entity + dirty-flag tests (reference semantics: src/luminary/scene.c)."""

import numpy as np

from luminary_tpu.scene import (
    Camera,
    DirtyFlags,
    Material,
    Mesh,
    RendererSettings,
    Scene,
    Sky,
    ToneMap,
)


def make_quad_mesh():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float32
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    return Mesh(vertices=verts, triangles=tris)


def test_scene_starts_fully_dirty():
    s = Scene()
    assert s.dirty == DirtyFlags.ALL


def test_set_entity_noop_keeps_clean():
    s = Scene()
    s.consume_dirty()
    cam = s.get_entity("camera")
    flags = s.set_entity("camera", cam)
    assert flags == DirtyFlags.NONE
    assert s.dirty == DirtyFlags.NONE


def test_camera_output_only_fields():
    s = Scene()
    s.consume_dirty()
    cam = s.get_entity("camera")
    cam.exposure = 2.0
    cam.tonemap = ToneMap.ACES
    flags = s.set_entity("camera", cam)
    assert flags == DirtyFlags.OUTPUT
    assert not flags & DirtyFlags.INTEGRATION


def test_camera_move_restarts_integration():
    s = Scene()
    s.consume_dirty()
    cam = s.get_entity("camera")
    cam.pos = (1.0, 2.0, 3.0)
    flags = s.set_entity("camera", cam)
    assert flags & DirtyFlags.INTEGRATION


def test_resolution_change_dirties_buffers():
    s = Scene()
    s.consume_dirty()
    st = s.get_entity("settings")
    st.width = 640
    st.height = 480
    flags = s.set_entity("settings", st)
    assert flags & DirtyFlags.BUFFERS


def test_max_depth_change_no_buffer_realloc():
    s = Scene()
    s.consume_dirty()
    st = s.get_entity("settings")
    st.max_ray_depth = 4
    flags = s.set_entity("settings", st)
    assert flags & DirtyFlags.INTEGRATION
    assert not flags & DirtyFlags.BUFFERS


def test_sky_change_dirties_luts():
    s = Scene()
    s.consume_dirty()
    sky = s.get_entity("sky")
    sky.altitude = 1.0
    flags = s.set_entity("sky", sky)
    assert flags & DirtyFlags.SKY_LUT


def test_materials_and_instances():
    s = Scene()
    mid = s.add_material(Material(albedo=(1, 0, 0, 1)))
    assert s.get_material(mid).albedo == (1, 0, 0, 1)
    inst = s.new_instance()
    inst.position = (1.0, 0.0, 0.0)
    s.set_instance(inst)
    assert s.get_instance(inst.id).position == (1.0, 0.0, 0.0)
    assert s.num_instances == 1


def test_mesh_normals_and_aabb():
    m = make_quad_mesh()
    n = m.face_normals()
    assert np.allclose(np.abs(n[:, 2]), 1.0)
    lo, hi = m.aabb()
    assert np.allclose(lo, [0, 0, 0]) and np.allclose(hi, [1, 1, 0])


def test_get_entity_returns_copy():
    s = Scene()
    cam = s.get_entity("camera")
    cam.pos = (9.0, 9.0, 9.0)
    assert s.get_entity("camera").pos != (9.0, 9.0, 9.0)
