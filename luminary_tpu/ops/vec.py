"""Component-SoA 3-vectors for the hot path.

TPU tiles put the minor axis on 128 lanes: an ``[N, 3]`` array pads 3 → 128
(42x wasted memory/bandwidth) whenever a minor-axis reduction (dot, norm)
forces that layout. Measured: identical vector workloads run ~7x faster with
one flat ``[N]`` array per component. ``Vec3`` is a NamedTuple of the three
component arrays — a pytree, so it flows through jit/scan/where naturally —
with the vector algebra the integrator needs.

(The same per-component discipline governs the BVH/geometry tables in
ops/traverse.py and render/device_scene.py.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Vec3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic ----------------------------------------------------------

    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    def __radd__(self, o):
        return self.__add__(o)

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return Vec3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        return Vec3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    # -- conversion ----------------------------------------------------------

    @staticmethod
    def from_array(a):
        """[..., 3] array → Vec3 of [...] components."""
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def of(x, y, z, like=None):
        """Vec3 from scalars, broadcast to `like`'s shape when given."""
        if like is not None:
            shape = like.x.shape if isinstance(like, Vec3) else like.shape
            return Vec3(
                jnp.broadcast_to(jnp.asarray(x, jnp.float32), shape),
                jnp.broadcast_to(jnp.asarray(y, jnp.float32), shape),
                jnp.broadcast_to(jnp.asarray(z, jnp.float32), shape),
            )
        return Vec3(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32),
            jnp.asarray(z, jnp.float32),
        )

    def to_array(self):
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    @property
    def shape(self):
        return self.x.shape


def dot(a: Vec3, b: Vec3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def length(v: Vec3):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: Vec3, eps: float = 1e-20) -> Vec3:
    inv = jnp.reciprocal(jnp.maximum(length(v), eps))
    return Vec3(v.x * inv, v.y * inv, v.z * inv)


def vwhere(mask, a: Vec3, b: Vec3) -> Vec3:
    """Component select by a [N] (or scalar) mask."""
    return Vec3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def reflect(v: Vec3, n: Vec3) -> Vec3:
    d = 2.0 * dot(v, n)
    return Vec3(v.x - d * n.x, v.y - d * n.y, v.z - d * n.z)


def orthonormal_basis(n: Vec3) -> tuple[Vec3, Vec3]:
    """Branchless ONB (Duff et al. 2017)."""
    s = jnp.where(n.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n.z)
    b = n.x * n.y * a
    t = Vec3(1.0 + s * n.x * n.x * a, s * b, -s * n.x)
    bt = Vec3(b, s + n.y * n.y * a, -n.y)
    return t, bt


def quaternion_apply_v(qw, qx, qy, qz, v: Vec3) -> Vec3:
    """Rotate v by quaternion components (scalars or [N])."""
    u = Vec3(qx, qy, qz)
    dot_uv = dot(u, v)
    dot_uu = qx * qx + qy * qy + qz * qz
    c = cross(u, v)
    s = qw
    k1 = 2.0 * dot_uv
    k2 = s * s - dot_uu
    k3 = 2.0 * s
    return Vec3(
        u.x * k1 + v.x * k2 + c.x * k3,
        u.y * k1 + v.y * k2 + c.y * k3,
        u.z * k1 + v.z * k2 + c.z * k3,
    )


def gather(tab: Vec3, idx) -> Vec3:
    """Per-component table gather: tab components are [M] arrays."""
    return Vec3(tab.x[idx], tab.y[idx], tab.z[idx])
