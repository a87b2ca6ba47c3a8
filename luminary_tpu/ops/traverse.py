"""Wavefront BVH traversal — component-SoA, two execution tiers.

TPU-native replacement for the reference's OptiX RT-core traversal (reference:
src/luminary/device/optix/optix_kernel_raytrace.cu) and its dormant custom
stackful kernel (src/luminary/device/cuda/bvh.cuh, compiled out).

Layout rules that shaped this design (all measured on v5e):
  * per-ray dynamic ROW indexing (stacks, take_along_axis) ≈ 1 ms/iter → the
    deep tier is stackless (bit-trail + parent links), per-ray state is flat;
  * [N, 3] vectors pad 3 → 128 lanes (7x waste) → everything is per-component
    flat arrays (ops/vec.py), including the node/triangle tables;
  * gathers scan their table (O(N·M)) while dense brute-force Möller-Trumbore
    streams on the VPU → scenes up to DENSE_MAX_SLOTS triangles skip the tree
    entirely and intersect statically-sliced triangle tiles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import MISS_DIST, ray_aabb, ray_triangle
from .vec import Vec3, gather as vgather

INVALID_CHILD = np.int32(0x7FFFFFFF)
MAX_TRAIL_DEPTH = 64  # two u32 trail words; builder enforces this bound

DENSE_MAX_SLOTS = 8192
_DENSE_TILE = 512


class DeviceBVH(NamedTuple):
    """Threaded BVH + leaf-slot-ordered triangle geometry, per-component.

    Node ids: >= 0 interior, < 0 leaf block (~id), INVALID_CHILD absent.
    Shading attributes live in the same slot order (see DeviceScene) so a
    hit's slot id indexes everything with no indirection.
    """

    c0_min: Vec3  # [M] per component — child 0 AABB
    c0_max: Vec3
    c1_min: Vec3
    c1_max: Vec3
    child0: jnp.ndarray  # i32 [M]
    child1: jnp.ndarray  # i32 [M]
    node_parent: jnp.ndarray  # i32 [M]
    node_sibling: jnp.ndarray  # i32 [M]
    leaf_parent: jnp.ndarray  # i32 [B]
    leaf_sibling: jnp.ndarray  # i32 [B]
    tri_v0: Vec3  # [P]  (P = B * leaf_size, padded)
    tri_e1: Vec3
    tri_e2: Vec3


class Hit(NamedTuple):
    t: jnp.ndarray  # f32 [N] — MISS_DIST on miss
    slot: jnp.ndarray  # i32 [N] — leaf-slot index, -1 on miss
    u: jnp.ndarray  # f32 [N] barycentric
    v: jnp.ndarray  # f32 [N]

    @property
    def valid(self) -> jnp.ndarray:
        return self.slot >= 0


def pack_device_bvh(bvh, links, v0, e1, e2) -> DeviceBVH:
    """numpy BVH2 (+links) + slot triangles → per-component DeviceBVH.

    All leaves stay numpy; the caller ships them via fast_device_put.
    """
    node_parent, node_sibling, leaf_parent, leaf_sibling = links
    cm = bvh.child_min
    cx = bvh.child_max

    def v3(a):
        return Vec3(
            np.ascontiguousarray(a[..., 0]),
            np.ascontiguousarray(a[..., 1]),
            np.ascontiguousarray(a[..., 2]),
        )

    return DeviceBVH(
        c0_min=v3(cm[:, 0]),
        c0_max=v3(cx[:, 0]),
        c1_min=v3(cm[:, 1]),
        c1_max=v3(cx[:, 1]),
        child0=np.ascontiguousarray(bvh.child[:, 0]),
        child1=np.ascontiguousarray(bvh.child[:, 1]),
        node_parent=node_parent,
        node_sibling=node_sibling,
        leaf_parent=leaf_parent,
        leaf_sibling=leaf_sibling,
        tri_v0=v3(v0),
        tri_e1=v3(e1),
        tri_e2=v3(e2),
    )


def _parent_of(bvh: DeviceBVH, node):
    is_leaf = node < 0
    idx_i = jnp.where(is_leaf, 0, node)
    idx_l = jnp.where(is_leaf, ~node, 0)
    return jnp.where(is_leaf, bvh.leaf_parent[idx_l], bvh.node_parent[idx_i])


def _sibling_of(bvh: DeviceBVH, node):
    is_leaf = node < 0
    idx_i = jnp.where(is_leaf, 0, node)
    idx_l = jnp.where(is_leaf, ~node, 0)
    return jnp.where(is_leaf, bvh.leaf_sibling[idx_l], bvh.node_sibling[idx_i])


def _safe_inv(direction: Vec3) -> Vec3:
    """1/d with zero components clamped (no 0*inf NaNs in the slab test)."""

    def f(c):
        return jnp.reciprocal(
            jnp.where(jnp.abs(c) < 1e-20, jnp.where(c < 0, -1e-20, 1e-20), c)
        )

    return Vec3(f(direction.x), f(direction.y), f(direction.z))


def _trace_dense(bvh: DeviceBVH, origin: Vec3, direction: Vec3, t_max,
                 any_hit: bool, t_min: float = 1e-4):
    """Brute-force all-slots intersection over static triangle tiles."""
    n = origin.x.shape[0]
    p = bvh.tri_v0.x.shape[0]
    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    slot_best = jnp.full((n,), -1, jnp.int32)
    u_best = jnp.zeros((n,), jnp.float32)
    v_best = jnp.zeros((n,), jnp.float32)

    o2 = Vec3(origin.x[:, None], origin.y[:, None], origin.z[:, None])
    d2 = Vec3(direction.x[:, None], direction.y[:, None], direction.z[:, None])

    def tile_vec(tab: Vec3, start, end):
        return Vec3(
            tab.x[None, start:end], tab.y[None, start:end], tab.z[None, start:end]
        )

    for start in range(0, p, _DENSE_TILE):
        end = min(start + _DENSE_TILE, p)
        tile = end - start
        t, u, v, hit = ray_triangle(
            o2, d2,
            tile_vec(bvh.tri_v0, start, end),
            tile_vec(bvh.tri_e1, start, end),
            tile_vec(bvh.tri_e2, start, end),
            t_min=t_min,
        )
        t = jnp.where(hit, t, MISS_DIST)
        t_tile = jnp.min(t, axis=1)
        # winner extraction without per-row gathers (~1 ms/iter on TPU)
        slots_iota = jax.lax.broadcasted_iota(jnp.int32, (n, tile), 1)
        at_min = t == t_tile[:, None]
        slot_tile = jnp.min(
            jnp.where(at_min, slots_iota, jnp.int32(0x7FFFFFFF)), axis=1
        )
        winner = slots_iota == slot_tile[:, None]
        u_tile = jnp.max(jnp.where(winner, u, -MISS_DIST), axis=1)
        v_tile = jnp.max(jnp.where(winner, v, -MISS_DIST), axis=1)
        improved = t_tile < t_best
        t_best = jnp.where(improved, t_tile, t_best)
        slot_best = jnp.where(improved, start + slot_tile, slot_best)
        u_best = jnp.where(improved, u_tile, u_best)
        v_best = jnp.where(improved, v_tile, v_best)

    t_out = jnp.where(slot_best >= 0, t_best, MISS_DIST)
    return Hit(t=t_out, slot=slot_best, u=u_best, v=v_best)


def _traverse(bvh: DeviceBVH, origin: Vec3, direction: Vec3, t_max,
              leaf_size: int, any_hit: bool, t_min: float = 1e-4):
    """Stackless bit-trail walk (deep tier), fully lane-parallel."""
    n = origin.x.shape[0]
    inv_dir = _safe_inv(direction)

    node = jnp.zeros((n,), jnp.int32)  # root
    trail_lo = jnp.zeros((n,), jnp.uint32)
    trail_hi = jnp.zeros((n,), jnp.uint32)
    backtrack = jnp.zeros((n,), bool)
    done = jnp.zeros((n,), bool)
    t_best = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    slot_best = jnp.full((n,), -1, jnp.int32)
    u_best = jnp.zeros((n,), jnp.float32)
    v_best = jnp.zeros((n,), jnp.float32)

    def cond(state):
        return ~jnp.all(state[5])

    def body(state):
        node, trail_lo, trail_hi, backtrack, t_best, done, slot_best, u_best, v_best = state
        live = ~done

        # ---------- leaf lanes: unrolled fixed-size block ----------
        at_leaf = live & ~backtrack & (node < 0)
        base = jnp.where(at_leaf, ~node, 0) * leaf_size
        for k in range(leaf_size):
            sl = base + k
            t, u, v, tri_hit = ray_triangle(
                origin, direction,
                vgather(bvh.tri_v0, sl),
                vgather(bvh.tri_e1, sl),
                vgather(bvh.tri_e2, sl),
                t_min=t_min,
            )
            better = tri_hit & at_leaf & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            slot_best = jnp.where(better, sl, slot_best)
            u_best = jnp.where(better, u, u_best)
            v_best = jnp.where(better, v, v_best)
        if any_hit:
            done = done | (at_leaf & (slot_best >= 0))
            live = ~done

        # ---------- interior lanes: slab-test both children ----------
        descend = live & ~backtrack & (node >= 0)
        nidx = jnp.where(descend, node, 0)
        ch0 = bvh.child0[nidx]
        ch1 = bvh.child1[nidx]
        e0, h0 = ray_aabb(
            origin, inv_dir, vgather(bvh.c0_min, nidx), vgather(bvh.c0_max, nidx),
            t_best, t_min=0.0,
        )
        e1_, h1 = ray_aabb(
            origin, inv_dir, vgather(bvh.c1_min, nidx), vgather(bvh.c1_max, nidx),
            t_best, t_min=0.0,
        )
        h0 &= (ch0 != INVALID_CHILD) & descend
        h1 &= (ch1 != INVALID_CHILD) & descend
        n_hits = h0.astype(jnp.int32) + h1.astype(jnp.int32)
        swap = (e1_ < e0) & h1
        near = jnp.where(swap, ch1, jnp.where(h0, ch0, ch1))

        go_down = descend & (n_hits > 0)
        push_bit = (n_hits == 2).astype(jnp.uint32)
        new_lo = (trail_lo << 1) | push_bit
        new_hi = (trail_hi << 1) | (trail_lo >> 31)
        trail_lo = jnp.where(go_down, new_lo, trail_lo)
        trail_hi = jnp.where(go_down, new_hi, trail_hi)
        node = jnp.where(go_down, near, node)

        backtrack = backtrack | (descend & (n_hits == 0)) | at_leaf

        # ---------- backtracking lanes: one walk-up / cross step ----------
        bt = live & backtrack & ~go_down
        trail_zero = (trail_lo | trail_hi) == 0
        done = done | (bt & trail_zero)
        bt &= ~trail_zero
        pending = (trail_lo & 1) == 1
        cross_ = bt & pending
        sib = _sibling_of(bvh, node)
        node = jnp.where(cross_, sib, node)
        trail_lo = jnp.where(cross_, trail_lo ^ 1, trail_lo)
        backtrack = jnp.where(cross_, False, backtrack)
        up = bt & ~pending
        par = _parent_of(bvh, node)
        node = jnp.where(up, par, node)
        trail_lo = jnp.where(up, (trail_lo >> 1) | (trail_hi << 31), trail_lo)
        trail_hi = jnp.where(up, trail_hi >> 1, trail_hi)

        return node, trail_lo, trail_hi, backtrack, t_best, done, slot_best, u_best, v_best

    state = (node, trail_lo, trail_hi, backtrack, t_best, done, slot_best, u_best, v_best)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, _, t_best, _, slot_best, u_best, v_best = state
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
    origin: Vec3,
    direction: Vec3,
    t_max=MISS_DIST,
    leaf_size: int = 4,
    chunk: int | None = None,
) -> Hit:
    """Closest-hit query for a component-SoA ray wavefront."""
    n = origin.x.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    dense = bvh.tri_v0.x.shape[0] <= DENSE_MAX_SLOTS

    def run(args):
        o, d, tm = args
        if dense:
            return _trace_dense(bvh, o, d, tm, any_hit=False)
        return _traverse(bvh, o, d, tm, leaf_size, any_hit=False)

    return _chunked(run, n, chunk, (origin, direction, t_max))


def trace_occluded(
    bvh: DeviceBVH,
    origin: Vec3,
    direction: Vec3,
    t_max,
    leaf_size: int = 4,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Occlusion query: True where any geometry lies within t_max."""
    n = origin.x.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    dense = bvh.tri_v0.x.shape[0] <= DENSE_MAX_SLOTS

    def run(args):
        o, d, tm = args
        if dense:
            hit = _trace_dense(bvh, o, d, tm, any_hit=True)
        else:
            hit = _traverse(bvh, o, d, tm, leaf_size, any_hit=True)
        return hit.slot >= 0

    return _chunked(run, n, chunk, (origin, direction, t_max))


def compute_links(child: np.ndarray, num_blocks: int):
    """Derive parent/sibling link tables from the child array (host side)."""
    m = child.shape[0]
    node_parent = np.full(m, -1, np.int32)
    node_sibling = np.full(m, INVALID_CHILD, np.int32)
    leaf_parent = np.full(max(num_blocks, 1), -1, np.int32)
    leaf_sibling = np.full(max(num_blocks, 1), INVALID_CHILD, np.int32)
    ids = np.arange(m, dtype=np.int32)
    for side in (0, 1):
        me = child[:, side]
        sib = child[:, 1 - side]
        interior = (me != INVALID_CHILD) & (me >= 0)
        node_parent[me[interior]] = ids[interior]
        node_sibling[me[interior]] = sib[interior]
        leaf = me < 0
        leaf_parent[~me[leaf]] = ids[leaf]
        leaf_sibling[~me[leaf]] = sib[leaf]
    return node_parent, node_sibling, leaf_parent, leaf_sibling
