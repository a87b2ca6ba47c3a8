"""Ray-primitive intersection kernels (batched jnp).

Replaces the reference's OptiX RT-core intersections + dormant custom
traversal (reference: src/luminary/device/cuda/bvh.cuh — compiled out;
device/optix/*.cu). Triangle test is Möller-Trumbore in the precomputed
(v0, e1, e2) form; AABB test is the branchless slab method. Both are written
to vectorize over arbitrary leading batch dims on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math3

# Distance returned for misses — also the ray-alive sentinel
# (reference uses FLT_MAX the same way).
MISS_DIST = jnp.float32(3.0e38)


def ray_triangle(
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    v0: jnp.ndarray,
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    t_min: float | jnp.ndarray = 1e-4,
):
    """Möller-Trumbore over broadcastable batches.

    Returns (t, u, v, hit) where hit=False gives t=MISS_DIST. Backface hits
    are reported (the integrator decides what to do with them).
    """
    pvec = jnp.cross(direction, e2)
    det = math3.dot(e1, pvec)
    # Near-zero determinant → parallel → miss.
    parallel = jnp.abs(det) < 1e-12
    inv_det = jnp.reciprocal(jnp.where(parallel, 1.0, det))
    tvec = origin - v0
    u = math3.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = math3.dot(direction, qvec) * inv_det
    t = math3.dot(e2, qvec) * inv_det
    hit = (
        (~parallel)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(hit, t, MISS_DIST), u, v, hit


def ray_aabb(
    origin: jnp.ndarray,
    inv_direction: jnp.ndarray,
    box_min: jnp.ndarray,
    box_max: jnp.ndarray,
    t_max: jnp.ndarray,
    t_min: float | jnp.ndarray = 0.0,
):
    """Branchless slab test.

    Args broadcast; inv_direction is 1/direction with ±inf for zero
    components (jnp division produces that naturally).
    Returns (entry_t, hit).
    """
    t0 = (box_min - origin) * inv_direction
    t1 = (box_max - origin) * inv_direction
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    entry = jnp.maximum(jnp.max(near, axis=-1), t_min)
    exit_ = jnp.minimum(jnp.min(far, axis=-1), t_max)
    return entry, entry <= exit_
