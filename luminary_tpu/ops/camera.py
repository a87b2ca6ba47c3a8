"""Camera ray generation (thin lens; physical lens stack comes later).

Matches the reference's thin-lens model so framing is identical
(reference: src/luminary/device/cuda/camera_thin_lens.cuh,
camera.cuh:11-39): sensor plane at +Z looking down -Z in camera space, fov
encodes the half-width of the sensor at z=1, aperture/focal distances in
millimetre lens units scaled by CAMERA_COMMON_SCALE into world units, and the
per-sample (not per-pixel) subpixel jitter. Component-SoA throughout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .random import RandomTarget, quasi_2d, random_1d, random_2d
from .vec import Vec3, normalize, quaternion_apply_v

CAMERA_COMMON_SCALE = 0.001
CAMERA_COMMON_INV_SCALE = 1.0 / CAMERA_COMMON_SCALE


class DeviceCamera(NamedTuple):
    """Packed camera state for the jitted render step."""

    pos: jnp.ndarray  # f32 [3]
    rotation_q: jnp.ndarray  # f32 [4] quaternion [w,x,y,z]
    fov: jnp.ndarray  # f32 scalar (thin-lens sensor half-width at z=1)
    aperture_size: jnp.ndarray  # f32 scalar (lens units)
    aperture_blade_count: jnp.ndarray  # i32 scalar
    aperture_shape_bladed: jnp.ndarray  # bool scalar
    object_distance: jnp.ndarray  # f32 scalar (world units)
    camera_scale: jnp.ndarray  # f32 scalar
    phys: object  # DevicePhysicalCamera | None (lens-stack mode)


def pack_camera(camera) -> DeviceCamera:
    """Scene Camera entity → DeviceCamera (reference: device_structs.c:75).

    Built in numpy and shipped with one device_put (eager per-array TPU
    transfers are expensive on the tunneled backend)."""
    import numpy as np

    rx, ry, rz = (float(v) * 0.5 for v in camera.rotation)
    cr, sr, cp, sp, cy, sy = (
        np.cos(rx), np.sin(rx), np.cos(ry), np.sin(ry), np.cos(rz), np.sin(rz)
    )
    q = np.asarray(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        np.float32,
    )
    import jax

    phys = None
    if camera.use_physical_camera:
        from .camera_physical import pack_physical_camera

        phys = pack_physical_camera(camera)
    return jax.device_put(
        DeviceCamera(
            pos=np.asarray(camera.pos, np.float32),
            rotation_q=q,
            fov=np.float32(camera.thin_lens.fov),
            aperture_size=np.float32(camera.thin_lens.aperture_size),
            aperture_blade_count=np.int32(max(camera.aperture_blade_count, 3)),
            aperture_shape_bladed=np.bool_(int(camera.aperture_shape) == 1),
            object_distance=np.float32(camera.object_distance),
            camera_scale=np.float32(camera.camera_scale),
            phys=phys,
        )
    )


def _sample_aperture(cam: DeviceCamera, pixel_id, sample_id, bn=None) -> Vec3:
    """Aperture point in lens units (reference: camera_thin_lens.cuh
    camera_thin_lens_sample_aperture). Weight forced to 1 like the reference."""
    r = random_2d(RandomTarget.LENS, pixel_id, sample_id, bn=bn)
    r0, r1 = r[..., 0], r[..., 1]
    aperture = cam.aperture_size * CAMERA_COMMON_INV_SCALE

    # Round aperture
    alpha = r0 * (2.0 * jnp.pi)
    beta = jnp.sqrt(r1) * aperture
    round_x = jnp.cos(alpha) * beta
    round_y = jnp.sin(alpha) * beta

    # Bladed aperture: uniform point in the triangle fan sector
    blades = cam.aperture_blade_count.astype(jnp.float32)
    blade = jnp.floor(
        random_1d(RandomTarget.LENS_BLADE, pixel_id, sample_id, bn=bn) * blades
    )
    a = jnp.sqrt(r0)
    u = 1.0 - a
    v = a * r1
    step = (2.0 * jnp.pi) / blades
    a1 = step * blade
    a2 = step * (blade + 1.0)
    bladed_x = (jnp.sin(a1) * u + jnp.sin(a2) * v) * aperture
    bladed_y = (jnp.cos(a1) * u + jnp.cos(a2) * v) * aperture

    open_ap = cam.aperture_size > 0.0
    x = jnp.where(open_ap, jnp.where(cam.aperture_shape_bladed, bladed_x, round_x), 0.0)
    y = jnp.where(open_ap, jnp.where(cam.aperture_shape_bladed, bladed_y, round_y), 0.0)
    return Vec3(x, y, jnp.zeros_like(x))


def generate_camera_rays(
    cam: DeviceCamera,
    width: int,
    height: int,
    pixel_x: jnp.ndarray,
    pixel_y: jnp.ndarray,
    pixel_id: jnp.ndarray,
    sample_id,
    bn=None,
):
    """Thin-lens primary rays for a pixel wavefront → (origin, direction)
    component-SoA Vec3s in world space."""
    # One jitter shared by all pixels of a sample (reference:
    # camera_utils.cuh:23-27 keys the jitter on pixel (0,0)) — computed on a
    # single lane and broadcast (the Sobol chain is ~50 u32 multiplies).
    jitter = quasi_2d(
        RandomTarget.CAMERA_JITTER, jnp.zeros((1,), jnp.uint32), sample_id
    )
    jx = jitter.reshape(-1)[0]
    jy = jitter.reshape(-1)[1]

    step = 2.0 * cam.fov / width
    vfov = step * height * 0.5
    sx = cam.fov - step * (pixel_x.astype(jnp.float32) + jx)
    sy = -vfov + step * (pixel_y.astype(jnp.float32) + jy)
    sensor = Vec3(sx, sy, jnp.ones_like(sx))

    to_focal = normalize(-sensor)
    focal_len = jnp.maximum(cam.object_distance * CAMERA_COMMON_INV_SCALE, 0.01)
    scale = -focal_len / to_focal.z
    focal_point = to_focal * scale

    aperture_point = _sample_aperture(cam, pixel_id, sample_id, bn=bn)
    direction = normalize(focal_point - aperture_point)

    # To world space (reference: camera.cuh:30-36).
    qw, qx, qy, qz = (
        cam.rotation_q[0], cam.rotation_q[1], cam.rotation_q[2], cam.rotation_q[3]
    )
    origin = quaternion_apply_v(qw, qx, qy, qz, aperture_point)
    s = cam.camera_scale * CAMERA_COMMON_SCALE
    origin = Vec3(
        origin.x * s + cam.pos[0],
        origin.y * s + cam.pos[1],
        origin.z * s + cam.pos[2],
    )
    direction = quaternion_apply_v(qw, qx, qy, qz, direction)
    return origin, direction
