"""Wavefront BVH traversal — component-SoA, two execution tiers.

TPU-native replacement for the reference's OptiX RT-core traversal (reference:
src/luminary/device/optix/optix_kernel_raytrace.cu) and its dormant custom
CWBVH (src/luminary/device/bvh.c, compiled out — 8-wide nodes, the design this
module revives in TPU form).

Layout rules that shaped this design (all measured on v5e):
  * each extra kernel launch costs ~0.1 ms at N=262k while row-gathers run at
    memory speed → traversal steps must be FEW and FAT: one 8-wide node per
    step fetched as a single [N, 64] row-gather (bvh/wide.py layout);
  * per-ray dynamic ROW indexing (real stacks) is unusable → the short stack
    lives in `depth` flat [N] registers pushed/popped with static shifts;
  * [N, k] arrays pad their minor axis to 128 lanes → per-ray state is flat
    [N] per component (ops/vec.py), and the dense tier is oriented [T, N]
    (triangles in sublanes, rays in lanes) for full lane utilization;
  * scenes up to DENSE_MAX_SLOTS triangles skip the tree entirely and
    brute-force one [T, N] Möller-Trumbore tile on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import MISS_DIST, ray_triangle
from .vec import Vec3

INVALID_CHILD = np.int32(0x7FFFFFFF)

DENSE_MAX_SLOTS = 128  # one [T, N] tile; larger scenes take the wide tree
WIDE_LEAF = 14


@jax.tree_util.register_pytree_node_class
class DeviceBVH:
    """8-wide BVH + leaf-slot-ordered triangle geometry.

    node_rows f32 [M, 64] and leaf_rows f32 [B, 128] follow the layout in
    bvh/wide.py. tri_v0/e1/e2 are per-component [P] slot tables (P = B * 14)
    shared with shading-attribute indexing: a hit's slot id indexes everything
    with no indirection. `depth` is STATIC (pytree aux data): it sizes the
    traversal stack, so jit specializes per scene depth.
    """

    def __init__(self, node_rows, leaf_rows, tri_v0, tri_e1, tri_e2, depth: int):
        self.node_rows = node_rows
        self.leaf_rows = leaf_rows
        self.tri_v0 = tri_v0
        self.tri_e1 = tri_e1
        self.tri_e2 = tri_e2
        self.depth = depth

    def tree_flatten(self):
        return (
            (self.node_rows, self.leaf_rows, self.tri_v0, self.tri_e1, self.tri_e2),
            self.depth,
        )

    @classmethod
    def tree_unflatten(cls, depth, leaves):
        return cls(*leaves, depth)


class Hit(NamedTuple):
    t: jnp.ndarray  # f32 [N] — MISS_DIST on miss
    slot: jnp.ndarray  # i32 [N] — leaf-slot index, -1 on miss
    u: jnp.ndarray  # f32 [N] barycentric
    v: jnp.ndarray  # f32 [N]

    @property
    def valid(self) -> jnp.ndarray:
        return self.slot >= 0


def pack_device_bvh(wide, v0, e1, e2) -> DeviceBVH:
    """WideBVH (bvh/wide.py) + slot triangles [P, 3] → DeviceBVH.

    All leaves stay numpy; the caller ships them via fast_device_put.
    """
    from ..bvh.wide import pack_leaf_rows

    wide = pack_leaf_rows(wide, v0, e1, e2)

    def v3(a):
        return Vec3(
            np.ascontiguousarray(a[..., 0]),
            np.ascontiguousarray(a[..., 1]),
            np.ascontiguousarray(a[..., 2]),
        )

    return DeviceBVH(
        node_rows=wide.node_rows,
        leaf_rows=wide.leaf_rows,
        tri_v0=v3(v0),
        tri_e1=v3(e1),
        tri_e2=v3(e2),
        depth=int(wide.depth),
    )


def _safe_inv(direction: Vec3) -> Vec3:
    """1/d with zero components clamped (no 0*inf NaNs in the slab test)."""

    def f(c):
        return jnp.reciprocal(
            jnp.where(jnp.abs(c) < 1e-20, jnp.where(c < 0, -1e-20, 1e-20), c)
        )

    return Vec3(f(direction.x), f(direction.y), f(direction.z))


def _trace_dense(bvh: DeviceBVH, origin: Vec3, direction: Vec3, t_max,
                 any_hit: bool, t_min: float = 1e-4):
    """Brute-force [T, N] Möller-Trumbore over all slots (small scenes).

    Triangles ride the sublane axis, rays the lane axis — every VREG is fully
    packed, unlike an [N, T] orientation whose minor axis pads to 128.
    """
    n = origin.x.shape[0]
    o2 = Vec3(origin.x[None, :], origin.y[None, :], origin.z[None, :])
    d2 = Vec3(direction.x[None, :], direction.y[None, :], direction.z[None, :])
    tv = Vec3(bvh.tri_v0.x[:, None], bvh.tri_v0.y[:, None], bvh.tri_v0.z[:, None])
    te1 = Vec3(bvh.tri_e1.x[:, None], bvh.tri_e1.y[:, None], bvh.tri_e1.z[:, None])
    te2 = Vec3(bvh.tri_e2.x[:, None], bvh.tri_e2.y[:, None], bvh.tri_e2.z[:, None])

    t, u, v, hit = ray_triangle(o2, d2, tv, te1, te2, t_min=t_min)  # [T, N]
    t = jnp.where(hit, t, MISS_DIST)
    within = t <= t_max[None, :]
    t = jnp.where(within, t, MISS_DIST)
    t_best = jnp.min(t, axis=0)  # [N]
    p = t.shape[0]
    slots_iota = jax.lax.broadcasted_iota(jnp.int32, (p, n), 0)
    at_min = (t == t_best[None, :]) & (t < MISS_DIST)
    slot_best = jnp.min(
        jnp.where(at_min, slots_iota, jnp.int32(0x7FFFFFFF)), axis=0
    )
    found = slot_best != 0x7FFFFFFF
    slot_best = jnp.where(found, slot_best, -1)
    winner = slots_iota == slot_best[None, :]
    u_best = jnp.max(jnp.where(winner, u, -MISS_DIST), axis=0)
    v_best = jnp.max(jnp.where(winner, v, -MISS_DIST), axis=0)
    t_out = jnp.where(found, t_best, MISS_DIST)
    u_best = jnp.where(found, u_best, 0.0)
    v_best = jnp.where(found, v_best, 0.0)
    return Hit(t=t_out, slot=slot_best, u=u_best, v=v_best)


def _wide_slab(row, origin: Vec3, inv_dir: Vec3, t_lo, t_hi):
    """Slab-test the 8 children packed in a gathered node row [N, 64].

    Returns (dist list[8], hit list[8]) of [N] arrays. Absent children carry
    +inf/-inf bounds so they always miss.
    """
    dists, hits = [], []
    for k in range(8):
        t1x = (row[:, 0 + k] - origin.x) * inv_dir.x
        t2x = (row[:, 8 + k] - origin.x) * inv_dir.x
        t1y = (row[:, 16 + k] - origin.y) * inv_dir.y
        t2y = (row[:, 24 + k] - origin.y) * inv_dir.y
        t1z = (row[:, 32 + k] - origin.z) * inv_dir.z
        t2z = (row[:, 40 + k] - origin.z) * inv_dir.z
        enter = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.maximum(jnp.minimum(t1z, t2z), t_lo),
        )
        leave = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.minimum(jnp.maximum(t1z, t2z), t_hi),
        )
        dists.append(enter)
        hits.append(enter <= leave)
    return dists, hits


def _argmin8(dists, lives):
    """Tournament argmin over 8 masked [N] lanes → (index i32 [N], any bool)."""
    inf = jnp.float32(np.inf)
    d = [jnp.where(lv, dv, inf) for dv, lv in zip(dists, lives)]
    idx = [jnp.full(d[0].shape, k, jnp.int32) for k in range(8)]
    while len(d) > 1:
        nd, ni = [], []
        for a in range(0, len(d), 2):
            take_b = d[a + 1] < d[a]
            nd.append(jnp.where(take_b, d[a + 1], d[a]))
            ni.append(jnp.where(take_b, idx[a + 1], idx[a]))
        d, idx = nd, ni
    any_live = d[0] < inf
    return idx[0], any_live


def _select8(values, sel):
    """values: list of 8 [N] arrays; sel: i32 [N] → per-lane pick."""
    out = values[0]
    for k in range(1, 8):
        out = jnp.where(sel == k, values[k], out)
    return out


def _traverse_wide(bvh: DeviceBVH, origin: Vec3, direction: Vec3, t_max,
                   any_hit: bool, t_min: float = 1e-4):
    """8-wide BVH traversal, phase-split.

    Interior phase: one node-row gather + fused 8-child slab/select per step.
    Leaf phase: one leaf-row gather + 14 fused Möller-Trumbore tests.
    The short stack lives in `bvh.depth` flat [N] i32 registers packed as
    (node << 8) | pending_mask, pushed/popped with static shifts — per-lane
    dynamic indexing never happens.
    """
    nodes = bvh.node_rows
    leaves = bvh.leaf_rows
    stack_depth = max(int(bvh.depth), 1)
    n = origin.x.shape[0]
    inv_dir = _safe_inv(direction)

    cur = jnp.zeros((n,), jnp.int32)
    mask = jnp.full((n,), 0xFF, jnp.int32)
    sp = jnp.zeros((n,), jnp.int32)
    stack = [jnp.zeros((n,), jnp.int32) for _ in range(stack_depth)]
    parked = jnp.zeros((n,), bool)
    leaf = jnp.zeros((n,), jnp.int32)
    done = jnp.zeros((n,), bool)
    t_best = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    slot_best = jnp.full((n,), -1, jnp.int32)
    u_best = jnp.zeros((n,), jnp.float32)
    v_best = jnp.zeros((n,), jnp.float32)

    bits = [jnp.int32(1 << k) for k in range(8)]

    def interior_cond(st):
        return jnp.any(~st[5] & ~st[3])  # any lane neither done nor parked

    def interior_body(st):
        (cur, mask, sp, parked, leaf, done, t_best, slot_best, u_best, v_best,
         *stack) = st
        act = ~done & ~parked
        row = nodes[jnp.where(act, cur, 0)]
        dists, hits = _wide_slab(row, origin, inv_dir, jnp.float32(t_min), t_best)
        codes = [
            jax.lax.bitcast_convert_type(row[:, 48 + k], jnp.int32)
            for k in range(8)
        ]
        hitbits = jnp.zeros((n,), jnp.int32)
        lives = []
        for k in range(8):
            lv = hits[k] & ((mask & bits[k]) != 0) & (codes[k] != INVALID_CHILD)
            lives.append(lv)
            hitbits = hitbits | jnp.where(lv, bits[k], 0)
        if any_hit:
            # visitation order is irrelevant: take the lowest set bit
            low = hitbits & -hitbits
            sel = jnp.zeros((n,), jnp.int32)
            for k in range(1, 8):
                sel = jnp.where(low == bits[k], k, sel)
            any_live = hitbits != 0
        else:
            sel, any_live = _argmin8(dists, lives)
        sel_code = _select8(codes, sel)
        remaining = hitbits & ~_select8(bits, sel)

        go = act & any_live
        is_leaf = go & (sel_code < 0)
        is_int = go & (sel_code >= 0)
        push = is_int & (remaining != 0)
        no_live = act & ~any_live

        # --- push (static shift down; reg 0 is the top) ---
        entry = (cur << 8) | remaining
        new_stack = [jnp.where(push, entry, stack[0])]
        for i in range(1, stack_depth):
            new_stack.append(jnp.where(push, stack[i - 1], stack[i]))
        sp = jnp.where(push, sp + 1, sp)

        # --- pop (static shift up) ---
        can_pop = no_live & (sp > 0)
        top = new_stack[0]
        for i in range(stack_depth - 1):
            new_stack[i] = jnp.where(can_pop, new_stack[i + 1], new_stack[i])
        sp = jnp.where(can_pop, sp - 1, sp)
        done = done | (no_live & ~can_pop)

        cur = jnp.where(is_int, sel_code, cur)
        cur = jnp.where(can_pop, top >> 8, cur)
        mask = jnp.where(is_leaf, remaining, mask)
        mask = jnp.where(is_int, 0xFF, mask)
        mask = jnp.where(can_pop, top & 0xFF, mask)
        parked = parked | is_leaf
        leaf = jnp.where(is_leaf, ~sel_code, leaf)
        return (cur, mask, sp, parked, leaf, done, t_best, slot_best, u_best,
                v_best, *new_stack)

    def outer_cond(st):
        return ~jnp.all(st[5])

    def outer_body(st):
        st = jax.lax.while_loop(interior_cond, interior_body, st)
        (cur, mask, sp, parked, leaf, done, t_best, slot_best, u_best, v_best,
         *stack) = st
        # --- leaf phase: one row gather + 14 fused Möller-Trumbore tests ---
        row = leaves[jnp.where(parked, leaf, 0)]
        base = leaf * WIDE_LEAF
        for k in range(WIDE_LEAF):
            v0 = Vec3(row[:, k], row[:, 14 + k], row[:, 28 + k])
            e1 = Vec3(row[:, 42 + k], row[:, 56 + k], row[:, 70 + k])
            e2 = Vec3(row[:, 84 + k], row[:, 98 + k], row[:, 112 + k])
            t, u, v, tri_hit = ray_triangle(origin, direction, v0, e1, e2,
                                            t_min=t_min)
            better = tri_hit & parked & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            slot_best = jnp.where(better, base + k, slot_best)
            u_best = jnp.where(better, u, u_best)
            v_best = jnp.where(better, v, v_best)
        if any_hit:
            done = done | (parked & (slot_best >= 0))
        parked = jnp.zeros((n,), bool)
        return (cur, mask, sp, parked, leaf, done, t_best, slot_best, u_best,
                v_best, *stack)

    st = (cur, mask, sp, parked, leaf, done, t_best, slot_best, u_best,
          v_best, *stack)
    st = jax.lax.while_loop(outer_cond, outer_body, st)
    t_best, slot_best, u_best, v_best = st[6], st[7], st[8], st[9]
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
        return _traverse_wide(bvh, o, d, tm, any_hit=False)

    return _chunked(run, n, chunk, (origin, direction, t_max))


def trace_occluded(
    bvh: DeviceBVH,
    origin: Vec3,
    direction: Vec3,
    t_max,
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
            hit = _traverse_wide(bvh, o, d, tm, any_hit=True)
        return hit.slot >= 0

    return _chunked(run, n, chunk, (origin, direction, t_max))
