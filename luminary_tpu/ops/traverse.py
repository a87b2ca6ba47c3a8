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

import os as _os

# LUM_TRACE_DEBUG=1: every tree trace prints its lockstep iteration count.
_TRACE_DEBUG = _os.environ.get("LUM_TRACE_DEBUG") == "1"

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

    def __init__(self, node_rows, leaf_rows, tri_rows, tri_v0, tri_e1,
                 tri_e2, dense_tris, dense_slot, depth: int):
        self.node_rows = node_rows
        self.leaf_rows = leaf_rows
        self.tri_rows = tri_rows  # f32 [P, 16]: v0 xyz, e1 xyz, e2 xyz, pad
        self.tri_v0 = tri_v0
        self.tri_e1 = tri_e1
        self.tri_e2 = tri_e2
        # dense tier: VALID slots only, compacted (padding slots are ~60% of
        # small scenes and would be intersected brute-force otherwise)
        self.dense_tris = dense_tris  # f32 [T, 9] v0/e1/e2 or None
        self.dense_slot = dense_slot  # i32 [T] compact → leaf-slot id
        self.depth = depth

    def tree_flatten(self):
        return (
            (self.node_rows, self.leaf_rows, self.tri_rows, self.tri_v0,
             self.tri_e1, self.tri_e2, self.dense_tris, self.dense_slot),
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

    p = v0.shape[0]
    tri_rows = np.zeros((p, 16), np.float32)
    tri_rows[:, 0:3] = v0
    tri_rows[:, 3:6] = e1
    tri_rows[:, 6:9] = e2
    dense_tris = dense_slot = None
    if p <= 4 * DENSE_MAX_SLOTS:
        valid = np.nonzero(
            (np.abs(e1).sum(-1) > 0) | (np.abs(e2).sum(-1) > 0)
        )[0].astype(np.int32)
        t = max(int(valid.shape[0]), 1)
        t_pad = (t + 7) // 8 * 8
        dense_tris = np.zeros((t_pad, 9), np.float32)
        dense_slot = np.zeros((t_pad,), np.int32)
        if valid.shape[0]:
            dense_tris[:t, 0:3] = v0[valid]
            dense_tris[:t, 3:6] = e1[valid]
            dense_tris[:t, 6:9] = e2[valid]
            dense_slot[:t] = valid
    return DeviceBVH(
        node_rows=wide.node_rows,
        leaf_rows=wide.leaf_rows,
        tri_rows=tri_rows,
        tri_v0=v3(v0),
        tri_e1=v3(e1),
        tri_e2=v3(e2),
        dense_tris=dense_tris,
        dense_slot=dense_slot,
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
    tris = bvh.dense_tris
    tv = Vec3(tris[:, 0:1], tris[:, 1:2], tris[:, 2:3])
    te1 = Vec3(tris[:, 3:4], tris[:, 4:5], tris[:, 5:6])
    te2 = Vec3(tris[:, 6:7], tris[:, 7:8], tris[:, 8:9])

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
    winner = slots_iota == jnp.where(found, slot_best, -1)[None, :]
    # map compact index → leaf-slot id (tiny table, lowered to selects)
    slot_best = jnp.where(found, bvh.dense_slot[jnp.where(found, slot_best, 0)], -1)
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


PACKET = 8


def _traverse_wide(bvh: DeviceBVH, origin: Vec3, direction: Vec3, t_max,
                   any_hit: bool, t_min: float = 1e-4, active=None,
                   debug_counters: bool = False):
    """8-wide BVH traversal over 8-ray packets, single uniform loop.

    A packet is 8 consecutive rays riding the SUBLANE axis ([8, G] arrays,
    G packets in lanes): the per-step node-row gather is per PACKET
    ([G, 64] instead of [N, 64]) — 8x less gather traffic, the dominant
    cost. The packet follows the union of its rays' wanted children
    (per-ray slab tests reduced over the ray axis), so coherent packets
    (camera/shadow wavefronts in pixel order) pay almost nothing for
    sharing. Control state is per packet [G]; hit state per ray [8, G].

    Every iteration handles BOTH cases in lockstep: packets whose selected
    child is interior descend; packets whose selected child is a leaf
    intersect its 14 triangles inline ([14, 8, G] Möller-Trumbore on one
    [G, 128] leaf-row gather) and stay on the node with the child's pending
    bit cleared. A single loop (no interior/leaf phase split) makes the
    lockstep iteration count the max TOTAL steps over packets rather than a
    sum of per-phase maxima.

    Every unrolled per-child / per-triangle loop is a single 3D tensor op:
    measured on v5e, each XLA op inside a while_loop body costs ~5 us fixed,
    so the op count per body dominates below ~100 MB of traffic. The short
    stack is a [depth, G] i32 array packed as (node << 8) | pending_mask,
    pushed/popped with concat-shifts — per-lane dynamic indexing never
    happens.
    """
    nodes = bvh.node_rows
    leaves = bvh.leaf_rows
    stack_depth = max(int(bvh.depth), 1)
    n_in = origin.x.shape[0]
    if active is None:
        active = jnp.ones((n_in,), bool)

    # Pad the wavefront to a packet multiple with inactive rays.
    pad = (-n_in) % PACKET
    if pad:
        def padv(v):
            return Vec3(
                jnp.concatenate([v.x, jnp.zeros((pad,), v.x.dtype)]),
                jnp.concatenate([v.y, jnp.zeros((pad,), v.y.dtype)]),
                jnp.concatenate([v.z, jnp.ones((pad,), v.z.dtype)]),
            )
        origin = padv(origin)
        direction = padv(direction)
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), jnp.float32)])
        active = jnp.concatenate([active, jnp.zeros((pad,), bool)])
    n = n_in + pad
    g = n // PACKET

    def to_pg(x):  # [N] -> [PACKET, G]
        return x.reshape(g, PACKET).T

    o_pg = Vec3(to_pg(origin.x), to_pg(origin.y), to_pg(origin.z))
    d_pg = Vec3(to_pg(direction.x), to_pg(direction.y), to_pg(direction.z))
    inv_pg = _safe_inv(d_pg)
    ray_on = to_pg(active)  # [8, G]

    cur = jnp.zeros((g,), jnp.int32)
    mask = jnp.full((g,), 0xFF, jnp.int32)
    sp = jnp.zeros((g,), jnp.int32)
    stack = jnp.zeros((stack_depth, g), jnp.int32)
    done = ~jnp.any(ray_on, axis=0)  # all-inactive packets are born done
    t_best = to_pg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)))
    slot_best = jnp.full((PACKET, g), -1, jnp.int32)
    found = jnp.zeros((PACKET, g), bool)  # any-hit early-out per ray

    inf = jnp.float32(np.inf)
    child_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)  # [8, 1]

    def cond(st):
        return jnp.any(~st[3])

    def body(st):
        (cur, mask, sp, done, t_best, slot_best, found, stack) = st
        act = ~done
        rowT = nodes[jnp.where(act, cur, 0)].T  # [64, G]
        lo_x, hi_x = rowT[0:8], rowT[8:16]      # [8, G] per child
        lo_y, hi_y = rowT[16:24], rowT[24:32]
        lo_z, hi_z = rowT[32:40], rowT[40:48]
        codes = jax.lax.bitcast_convert_type(rowT[48:56], jnp.int32)  # [8, G]

        # --- slab: [8 children, 8 rays, G] ---
        ox, oy, oz = o_pg.x[None], o_pg.y[None], o_pg.z[None]
        ix, iy, iz = inv_pg.x[None], inv_pg.y[None], inv_pg.z[None]
        t1x = (lo_x[:, None, :] - ox) * ix
        t2x = (hi_x[:, None, :] - ox) * ix
        t1y = (lo_y[:, None, :] - oy) * iy
        t2y = (hi_y[:, None, :] - oy) * iy
        t1z = (lo_z[:, None, :] - oz) * iz
        t2z = (hi_z[:, None, :] - oz) * iz
        enter = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.maximum(jnp.minimum(t1z, t2z), jnp.float32(t_min)),
        )
        leave = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.minimum(jnp.maximum(t1z, t2z), t_best[None]),
        )
        ray_live = ray_on & ~found & act[None, :]
        ok = (enter <= leave) & ray_live[None]              # [8, 8, G]
        hits = jnp.any(ok, axis=1)                          # [8, G]
        dists = jnp.min(jnp.where(ok, enter, inf), axis=1)  # [8, G]

        pending = ((mask[None, :] >> child_iota) & 1) == 1  # [8, G]
        live = hits & pending & (codes != INVALID_CHILD)
        if any_hit:
            # visitation order irrelevant: first live child
            sel = jnp.argmax(live, axis=0)                  # [G]
            any_live = jnp.any(live, axis=0)
        else:
            d_masked = jnp.where(live, dists, inf)
            sel = jnp.argmin(d_masked, axis=0)              # [G]
            any_live = jnp.min(d_masked, axis=0) < inf
        # NOTE: a 7-op where-chain, NOT take_along_axis — a gather op inside
        # the loop body costs ~11 ns PER INDEX per iteration on TPU.
        sel_code = codes[0]
        for k in range(1, 8):
            sel_code = jnp.where(sel == k, codes[k], sel_code)
        hitbits = jnp.sum(
            jnp.where(live, jnp.int32(1) << child_iota, 0), axis=0
        )
        remaining = hitbits & ~(jnp.int32(1) << sel)

        go = act & any_live
        is_leaf = go & (sel_code < 0)
        is_int = go & (sel_code >= 0)
        push = is_int & (remaining != 0)
        no_live = act & ~any_live

        # --- leaf lanes: one [G, 128] gather + [14, 8, G] M-T, inline ---
        leaf_id = jnp.where(is_leaf, ~sel_code, 0)
        lrowT = leaves[leaf_id].T  # [128, G]
        tv0 = Vec3(lrowT[0:14, None, :], lrowT[14:28, None, :],
                   lrowT[28:42, None, :])
        te1 = Vec3(lrowT[42:56, None, :], lrowT[56:70, None, :],
                   lrowT[70:84, None, :])
        te2 = Vec3(lrowT[84:98, None, :], lrowT[98:112, None, :],
                   lrowT[112:126, None, :])
        o3 = Vec3(ox, oy, oz)
        d3 = Vec3(d_pg.x[None], d_pg.y[None], d_pg.z[None])
        t, u, v, tri_hit = ray_triangle(o3, d3, tv0, te1, te2, t_min=t_min)
        leaf_live = ray_live & is_leaf[None, :]
        t = jnp.where(tri_hit & leaf_live[None], t, inf)    # [14, 8, G]
        t14 = jnp.min(t, axis=0)                            # [8, G]
        k14 = jnp.argmin(t, axis=0)                         # [8, G]
        better = t14 < t_best
        base = (leaf_id * WIDE_LEAF)[None, :]               # [1, G]
        t_best = jnp.where(better, t14, t_best)
        slot_best = jnp.where(better, base + k14, slot_best)
        # u/v are NOT tracked in the loop (their per-ray selection would be a
        # per-iteration gather); they are recomputed once after the loop from
        # the winning slot.
        if any_hit:
            found = found | (slot_best >= 0)
            done = done | ~jnp.any(ray_on & ~found, axis=0)

        # --- push (concat-shift down; row 0 is the top) ---
        entry = (cur << 8) | remaining
        pushed = jnp.concatenate([entry[None, :], stack[:-1]], axis=0)
        stack = jnp.where(push[None, :], pushed, stack)
        sp = jnp.where(push, sp + 1, sp)

        # --- pop (concat-shift up) ---
        can_pop = no_live & (sp > 0)
        top = stack[0]
        popped = jnp.concatenate([stack[1:], stack[-1:]], axis=0)
        stack = jnp.where(can_pop[None, :], popped, stack)
        sp = jnp.where(can_pop, sp - 1, sp)
        done = done | (no_live & ~can_pop)

        cur = jnp.where(is_int, sel_code, cur)
        cur = jnp.where(can_pop, top >> 8, cur)
        mask = jnp.where(is_leaf, remaining, mask)  # stay on node, bit cleared
        mask = jnp.where(is_int, 0xFF, mask)
        mask = jnp.where(can_pop, top & 0xFF, mask)
        return (cur, mask, sp, done, t_best, slot_best, found, stack)

    st = (cur, mask, sp, done, t_best, slot_best, found, stack)
    if debug_counters:
        def body2(cs):
            return (cs[0] + 1, body(cs[1]))
        counters, st = jax.lax.while_loop(
            lambda cs: cond(cs[1]), body2, (jnp.int32(0), st)
        )
        counters = (counters, counters)
    else:
        st = jax.lax.while_loop(cond, body, st)
    t_best, slot_best = st[4], st[5]

    def from_pg(x):  # [PACKET, G] -> [N_in]
        return x.T.reshape(n)[:n_in]

    slot_out = from_pg(slot_best)
    valid = slot_out >= 0
    t_out = jnp.where(valid, from_pg(t_best), MISS_DIST)
    # Recompute barycentrics once from the winning triangle (one row gather).
    trow = bvh.tri_rows[jnp.where(valid, slot_out, 0)]  # [N, 16]
    o1 = Vec3(origin.x[:n_in], origin.y[:n_in], origin.z[:n_in])
    d1 = Vec3(direction.x[:n_in], direction.y[:n_in], direction.z[:n_in])
    _, u_out, v_out, _ = ray_triangle(
        o1, d1,
        Vec3(trow[:, 0], trow[:, 1], trow[:, 2]),
        Vec3(trow[:, 3], trow[:, 4], trow[:, 5]),
        Vec3(trow[:, 6], trow[:, 7], trow[:, 8]),
        t_min=t_min,
    )
    u_out = jnp.where(valid, u_out, 0.0)
    v_out = jnp.where(valid, v_out, 0.0)
    hit = Hit(t=t_out, slot=slot_out, u=u_out, v=v_out)
    if debug_counters:
        return hit, counters
    return hit


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
    active=None,
) -> Hit:
    """Closest-hit query for a component-SoA ray wavefront.

    `active` (bool [N], optional): lanes with False are skipped (they report
    a miss) — the lockstep tree walk then only runs as long as the slowest
    ACTIVE lane.
    """
    n = origin.x.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    dense = bvh.tri_v0.x.shape[0] <= DENSE_MAX_SLOTS
    if active is None:
        active = jnp.ones((n,), bool)

    def run(args):
        o, d, tm, act = args
        if dense:
            hit = _trace_dense(bvh, o, d, tm, any_hit=False)
        elif _TRACE_DEBUG:
            hit, c = _traverse_wide(bvh, o, d, tm, any_hit=False, active=act,
                                    debug_counters=True)
            jax.debug.print("closest trace: {i} iters", i=c[0])
        else:
            hit = _traverse_wide(bvh, o, d, tm, any_hit=False, active=act)
        slot = jnp.where(act, hit.slot, -1)
        return Hit(
            t=jnp.where(act, hit.t, MISS_DIST),
            slot=slot,
            u=hit.u,
            v=hit.v,
        )

    return _chunked(run, n, chunk, (origin, direction, t_max, active))


def trace_occluded(
    bvh: DeviceBVH,
    origin: Vec3,
    direction: Vec3,
    t_max,
    chunk: int | None = None,
    active=None,
) -> jnp.ndarray:
    """Occlusion query: True where any geometry lies within t_max.

    `active` as in trace_closest; inactive lanes report unoccluded.
    """
    n = origin.x.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    dense = (bvh.dense_tris is not None
             and bvh.dense_tris.shape[0] <= DENSE_MAX_SLOTS)
    if active is None:
        active = jnp.ones((n,), bool)

    def run(args):
        o, d, tm, act = args
        if dense:
            hit = _trace_dense(bvh, o, d, tm, any_hit=True)
        elif _TRACE_DEBUG:
            hit, c = _traverse_wide(bvh, o, d, tm, any_hit=True, active=act,
                                    debug_counters=True)
            jax.debug.print("any-hit trace: {i} iters", i=c[0])
        else:
            hit = _traverse_wide(bvh, o, d, tm, any_hit=True, active=act)
        return act & (hit.slot >= 0)

    return _chunked(run, n, chunk, (origin, direction, t_max, active))
