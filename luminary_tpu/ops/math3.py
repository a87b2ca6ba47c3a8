"""Vector/quaternion math over jnp arrays with trailing dim 3/4.

Device-side counterpart of the reference's vec3/quaternion library
(reference: src/luminary/device/cuda/math.cuh) — but expressed as batched jnp
ops over ``[..., 3]`` arrays so the VPU sees wide lanes instead of scalar
structs.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return v * jnp.reciprocal(jnp.maximum(length(v), eps))[..., None]


def quaternion_from_euler(rotation) -> jnp.ndarray:
    """Euler (roll=x, pitch=y, yaw=z) → quaternion [w,x,y,z].

    Matches the reference convention (reference: src/luminary/host_math.c:6-21)
    so .lum camera/instance rotations produce identical frames.
    """
    r = jnp.asarray(rotation, dtype=jnp.float32)
    cr, sr = jnp.cos(r[..., 0] * 0.5), jnp.sin(r[..., 0] * 0.5)
    cp, sp = jnp.cos(r[..., 1] * 0.5), jnp.sin(r[..., 1] * 0.5)
    cy, sy = jnp.cos(r[..., 2] * 0.5), jnp.sin(r[..., 2] * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quaternion_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by quaternion q=[w,x,y,z] (reference: math.cuh:398-413)."""
    u = q[..., 1:4]
    s = q[..., 0:1]
    dot_uv = jnp.sum(u * v, axis=-1, keepdims=True)
    dot_uu = jnp.sum(u * u, axis=-1, keepdims=True)
    return u * (2.0 * dot_uv) + v * (s * s - dot_uu) + jnp.cross(u, v) * (2.0 * s)


def quaternion_inverse(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect direction v about normal n (both unit)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def orthonormal_basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless ONB from a unit normal (Duff et al. 2017 construction)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    return (
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    )
