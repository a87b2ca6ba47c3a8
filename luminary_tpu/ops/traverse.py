"""Wavefront BVH traversal.

TPU-native replacement for the reference's OptiX RT-core traversal (reference:
src/luminary/device/optix/optix_kernel_raytrace.cu raygen) and its dormant
custom stackful kernel (src/luminary/device/cuda/bvh.cuh, compiled out).

Design: the classic per-ray short-stack loop, but *vectorized over the whole
ray wavefront* — every iteration, each live ray pops one node, the node data
for all rays is fetched with one batched gather, both children's slabs are
tested on the VPU, and hits are pushed near-first. Leaf blocks have a fixed
slot count, so leaf intersection is a uniform [N, LEAF] gather + batched
Möller-Trumbore with a min-reduction. Divergence costs masked lanes, not
scalarization; the loop runs until every ray's stack is empty (XLA while_loop).

Memory: traversal state is O(N × STACK_SIZE); callers chunk big wavefronts
with ``lax.map`` (see trace_closest's ``chunk`` argument).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import MISS_DIST, ray_aabb, ray_triangle

INVALID_CHILD = np.int32(0x7FFFFFFF)
STACK_SIZE = 64


class DeviceBVH(NamedTuple):
    """BVH + leaf-slot-ordered triangle geometry, ready for traversal.

    Shading attributes live in the same slot order (see DeviceScene) so the
    hit's slot_id indexes everything directly — no post-hit indirection.
    """

    child_min: jnp.ndarray  # f32 [M, 2, 3]
    child_max: jnp.ndarray  # f32 [M, 2, 3]
    child: jnp.ndarray  # i32 [M, 2]
    tri_v0: jnp.ndarray  # f32 [P, 3]  (P = num_blocks * leaf_size, padded)
    tri_e1: jnp.ndarray  # f32 [P, 3]
    tri_e2: jnp.ndarray  # f32 [P, 3]


class Hit(NamedTuple):
    t: jnp.ndarray  # f32 [N] — MISS_DIST on miss
    slot: jnp.ndarray  # i32 [N] — leaf-slot index, -1 on miss
    u: jnp.ndarray  # f32 [N] barycentric
    v: jnp.ndarray  # f32 [N]

    @property
    def valid(self) -> jnp.ndarray:
        return self.slot >= 0


def _push(stack, ptr, value, mask):
    """Vectorized conditional stack push (per-ray)."""
    n = stack.shape[0]
    idx = jnp.minimum(ptr, STACK_SIZE - 1)
    rows = jnp.arange(n)
    cur = stack[rows, idx]
    stack = stack.at[rows, idx].set(jnp.where(mask, value, cur))
    return stack, ptr + mask.astype(jnp.int32)


def _traverse(bvh: DeviceBVH, origin, direction, t_max, leaf_size: int, any_hit: bool,
              t_min: float = 1e-4):
    """Core loop shared by closest-hit and occlusion queries."""
    n = origin.shape[0]
    inv_dir = jnp.reciprocal(direction)  # ±inf for zero components is fine

    stack = jnp.zeros((n, STACK_SIZE), jnp.int32)  # root (0) pre-seeded at slot 0
    ptr = jnp.ones((n,), jnp.int32)
    t_best = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    slot_best = jnp.full((n,), -1, jnp.int32)
    u_best = jnp.zeros((n,), jnp.float32)
    v_best = jnp.zeros((n,), jnp.float32)
    rows = jnp.arange(n)

    def cond(state):
        _, ptr, *_ = state
        return jnp.any(ptr > 0)

    def body(state):
        stack, ptr, t_best, slot_best, u_best, v_best = state
        active = ptr > 0
        ptr_c = jnp.maximum(ptr - 1, 0)
        node = jnp.where(active, stack[rows, ptr_c], 0)
        ptr = ptr_c

        is_leaf = active & (node < 0)
        is_interior = active & (node >= 0)

        # ---- interior: test both children, push near-last ----
        nidx = jnp.where(is_interior, node, 0)
        cmin = bvh.child_min[nidx]  # [N, 2, 3]
        cmax = bvh.child_max[nidx]
        ch = bvh.child[nidx]  # [N, 2]
        entry, box_hit = ray_aabb(
            origin[:, None, :], inv_dir[:, None, :], cmin, cmax,
            t_best[:, None], t_min=0.0,
        )
        box_hit &= (ch != INVALID_CHILD) & is_interior[:, None]

        swap = entry[:, 1] < entry[:, 0]
        near_child = jnp.where(swap, ch[:, 1], ch[:, 0])
        far_child = jnp.where(swap, ch[:, 0], ch[:, 1])
        near_hit = jnp.where(swap, box_hit[:, 1], box_hit[:, 0])
        far_hit = jnp.where(swap, box_hit[:, 0], box_hit[:, 1])

        stack, ptr = _push(stack, ptr, far_child, far_hit)
        stack, ptr = _push(stack, ptr, near_child, near_hit)

        # ---- leaf: fixed-size block of triangles ----
        block = jnp.where(is_leaf, ~node, 0)
        slots = block[:, None] * leaf_size + jnp.arange(leaf_size)[None, :]  # [N, L]
        v0 = bvh.tri_v0[slots]  # [N, L, 3]
        e1 = bvh.tri_e1[slots]
        e2 = bvh.tri_e2[slots]
        t, u, v, tri_hit = ray_triangle(
            origin[:, None, :], direction[:, None, :], v0, e1, e2, t_min=t_min
        )
        tri_hit &= is_leaf[:, None] & (t < t_best[:, None])
        t = jnp.where(tri_hit, t, MISS_DIST)
        k = jnp.argmin(t, axis=-1)
        t_k = t[rows, k]
        improved = t_k < t_best
        t_best = jnp.where(improved, t_k, t_best)
        slot_best = jnp.where(improved, slots[rows, k], slot_best)
        u_best = jnp.where(improved, u[rows, k], u_best)
        v_best = jnp.where(improved, v[rows, k], v_best)

        if any_hit:
            # Occlusion query: first hit terminates the ray.
            ptr = jnp.where(slot_best >= 0, 0, ptr)

        return stack, ptr, t_best, slot_best, u_best, v_best

    state = (stack, ptr, t_best, slot_best, u_best, v_best)
    _, _, t_best, slot_best, u_best, v_best = jax.lax.while_loop(cond, body, state)
    t_out = jnp.where(slot_best >= 0, t_best, MISS_DIST)
    return Hit(t=t_out, slot=slot_best, u=u_best, v=v_best)


def _chunked(fn, n_rays: int, chunk: int | None, args):
    """Run fn over rays in fixed-size chunks via lax.map, flattening back."""
    if chunk is None or n_rays <= chunk:
        return fn(args)
    assert n_rays % chunk == 0, (
        f"ray count {n_rays} must be a multiple of chunk {chunk} "
        "(pad the wavefront)"
    )
    reshaped = jax.tree_util.tree_map(
        lambda x: x.reshape((n_rays // chunk, chunk) + x.shape[1:]), args
    )
    out = jax.lax.map(fn, reshaped)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_rays,) + x.shape[2:]), out
    )


def trace_closest(
    bvh: DeviceBVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    t_max=MISS_DIST,
    leaf_size: int = 4,
    chunk: int | None = None,
) -> Hit:
    """Closest-hit query for a ray wavefront.

    Args:
      origin/direction: f32 [N, 3].
      t_max: scalar or [N] max distance.
      chunk: process rays in chunks of this size to bound the O(N*STACK)
        traversal state (None = single chunk).
    """
    n = origin.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def run(args):
        o, d, tm = args
        return _traverse(bvh, o, d, tm, leaf_size, any_hit=False)

    return _chunked(run, n, chunk, (origin, direction, t_max))


def trace_occluded(
    bvh: DeviceBVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    t_max,
    leaf_size: int = 4,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Occlusion query: True where any geometry lies within t_max."""
    n = origin.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def run(args):
        o, d, tm = args
        hit = _traverse(bvh, o, d, tm, leaf_size, any_hit=True)
        return hit.slot >= 0

    return _chunked(run, n, chunk, (origin, direction, t_max))
