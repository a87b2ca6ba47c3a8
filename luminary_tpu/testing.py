"""Procedural test scenes (Cornell box etc.) used by tests and benchmarks.

The reference relies on external .obj/.lum assets for testing; we ship
generators so the test pyramid is hermetic.
"""

from __future__ import annotations

import numpy as np

from .scene.entities import Camera, Material, MaterialBaseSubstrate, SkyMode
from .scene.mesh import Mesh
from .scene.scene import Scene


def _quad(a, b, c, d):
    """Two triangles for quad a-b-c-d (counter-clockwise)."""
    return [[a, b, c], [a, c, d]]


def cornell_box_mesh() -> tuple[Mesh, list[Material]]:
    """The classic box: white floor/ceiling/back, red left, green right,
    an area light in the ceiling, and two interior boxes."""
    verts = []
    tris = []
    mats = []
    mat_ids = []

    def add_quad(p0, p1, p2, p3, mat):
        base = len(verts)
        verts.extend([p0, p1, p2, p3])
        tris.extend(_quad(base, base + 1, base + 2, base + 3))
        mat_ids.extend([mat, mat])

    WHITE, RED, GREEN, LIGHT = 0, 1, 2, 3
    # Room (2x2x2, open toward +Z camera): y up
    add_quad((-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1), WHITE)  # floor
    add_quad((-1, 2, 1), (1, 2, 1), (1, 2, -1), (-1, 2, -1), WHITE)  # ceiling
    add_quad((-1, 0, -1), (-1, 2, -1), (1, 2, -1), (1, 0, -1), WHITE)  # back
    add_quad((-1, 0, 1), (-1, 2, 1), (-1, 2, -1), (-1, 0, -1), RED)  # left
    add_quad((1, 0, -1), (1, 2, -1), (1, 2, 1), (1, 0, 1), GREEN)  # right
    # Ceiling light (wound so the face normal points down into the room —
    # emitters are one-sided like the reference's default)
    add_quad((-0.3, 1.98, -0.3), (0.3, 1.98, -0.3), (0.3, 1.98, 0.3), (-0.3, 1.98, 0.3), LIGHT)

    # Tall box
    def add_box(cx, cz, w, h, angle, mat):
        c, s = np.cos(angle), np.sin(angle)

        def rot(x, z):
            return (cx + x * c - z * s, cz + x * s + z * c)

        corners = [rot(-w, -w), rot(w, -w), rot(w, w), rot(-w, w)]
        # sides
        for i in range(4):
            (x0, z0), (x1, z1) = corners[i], corners[(i + 1) % 4]
            add_quad((x0, 0, z0), (x0, h, z0), (x1, h, z1), (x1, 0, z1), mat)
        # top
        (x0, z0), (x1, z1), (x2, z2), (x3, z3) = corners
        add_quad((x0, h, z0), (x1, h, z1), (x2, h, z2), (x3, h, z3), mat)

    add_box(-0.35, -0.35, 0.3, 1.2, 0.3, WHITE)
    add_box(0.4, 0.35, 0.28, 0.6, -0.25, WHITE)

    mesh = Mesh(
        vertices=np.asarray(verts, np.float32),
        triangles=np.asarray(tris, np.int32),
        material_ids=np.asarray(mat_ids, np.uint16),
        name="cornell_box",
    )
    mats = [
        Material(albedo=(0.73, 0.73, 0.73, 1.0), roughness=1.0),
        Material(albedo=(0.65, 0.05, 0.05, 1.0), roughness=1.0),
        Material(albedo=(0.12, 0.45, 0.15, 1.0), roughness=1.0),
        Material(
            albedo=(0.0, 0.0, 0.0, 1.0),
            emission=(15.0, 15.0, 15.0),
            emission_active=True,
        ),
    ]
    return mesh, mats


def cornell_scene(width: int = 64, height: int = 64, max_depth: int = 4) -> Scene:
    scene = Scene()
    mesh, mats = cornell_box_mesh()
    for m in mats:
        scene.add_material(m)
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)

    settings = scene.get_entity("settings")
    settings.width = width
    settings.height = height
    settings.max_ray_depth = max_depth
    scene.set_entity("settings", settings)

    cam = scene.get_entity("camera")
    cam.pos = (0.0, 1.0, 3.5)
    cam.rotation = (0.0, 0.0, 0.0)  # camera space looks down -Z → into the box
    cam.thin_lens.fov = 0.35
    cam.exposure = 1.0
    scene.set_entity("camera", cam)

    sky = scene.get_entity("sky")
    sky.mode = SkyMode.CONSTANT_COLOR
    sky.constant_color = (0.0, 0.0, 0.0)
    scene.set_entity("sky", sky)
    return scene


def sun_plane_scene(width: int = 64, height: int = 64) -> Scene:
    """A ground plane under the procedural sky — exercises sun NEE + sky."""
    scene = Scene()
    scene.add_material(Material(albedo=(0.5, 0.5, 0.5, 1.0), roughness=1.0))
    verts = np.asarray(
        [(-50, 0, -50), (50, 0, -50), (50, 0, 50), (-50, 0, 50)], np.float32
    )
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = Mesh(vertices=verts, triangles=tris, name="ground")
    scene.add_mesh(mesh)
    inst = scene.new_instance()
    inst.mesh_id = mesh.id
    scene.set_instance(inst)

    settings = scene.get_entity("settings")
    settings.width = width
    settings.height = height
    settings.max_ray_depth = 3
    scene.set_entity("settings", settings)

    cam = scene.get_entity("camera")
    cam.pos = (0.0, 2.0, 0.0)
    cam.rotation = (-0.3, 0.0, 0.0)
    scene.set_entity("camera", cam)
    return scene
