"""Wavefront BVH traversal — component-SoA, two execution tiers.

TPU-native replacement for the reference's OptiX RT-core traversal (reference:
src/luminary/device/optix/optix_kernel_raytrace.cu) and its dormant custom
CWBVH (src/luminary/device/bvh.c, compiled out — wide compressed nodes, the
design this module revives in TPU form).

Layout rules that shaped this design (all measured on v5e):
  * a row gather costs ~3 ns PER INDEX (measured in-loop at [32k, 128]) with
    row width nearly free up to 128 floats → traversal steps fetch exactly
    ONE 128-wide row from ONE unified node+leaf table per step (bvh/wide.py
    layout; 16-wide nodes); the body is DISPATCH-bound (~5 us per XLA op in a
    while_loop body), so per-step op count is the scarce resource;
  * the children of the current node live in [16, G] REGISTER arrays, so
    visiting a node's several leaf children re-fetches nothing;
  * per-ray dynamic ROW indexing (real stacks) is unusable → the short stack
    lives in [depth, G] arrays pushed/popped with static concat-shifts;
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

# LUM_NO_PALLAS=1 forces the pure-XLA loop body everywhere. Otherwise the
# fused Pallas body (ops/traverse_pallas.py) runs on TPU backends — measured
# 1.6-1.7x over the XLA body on the tree-tier bench (round 3).
_NO_PALLAS = _os.environ.get("LUM_NO_PALLAS") == "1"


def _use_pallas() -> bool:
    if _NO_PALLAS:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False

INVALID_CHILD = np.int32(0x7FFFFFFF)

DENSE_MAX_SLOTS = 128  # one [T, N] tile; larger scenes take the wide tree
WIDE_LEAF = 14
BRANCH = 16

# Internal lax.map chunk for tree walks. Measured on-chip (127k-tri scene,
# 1M incoherent rays): whole-wave while_loop 288 ms vs 159 ms at 64k chunks —
# the loop runs to the slowest packet of the WHOLE chunk, so smaller chunks
# bound the lockstep tail. Below ~16k the fixed per-iteration cost dominates.
TRACE_CHUNK = 1 << 17


@jax.tree_util.register_pytree_node_class
class DeviceBVH:
    """Unified 16-wide BVH table + leaf-slot-ordered triangle geometry.

    rows f32 [M + B, 128]: node rows (ids 0..M-1, bvh/wide.py node layout)
    followed by leaf rows (ids M..M+B-1, 14-triangle layout). tri_v0/e1/e2
    are per-component [P] slot tables (P = B * 14) shared with
    shading-attribute indexing: a hit's slot id indexes everything with no
    indirection. `depth` and `num_nodes` are STATIC (pytree aux data): depth
    sizes the traversal stack and num_nodes maps leaf codes to unified row
    ids, so jit specializes per scene shape.
    """

    def __init__(self, rows, tri_v0, tri_e1,
                 tri_e2, dense_tris, dense_slot, bounds, rows_shadow,
                 cut_tris, depth: int, num_nodes: int):
        self.rows = rows
        self.tri_v0 = tri_v0
        self.tri_e1 = tri_e1
        self.tri_e2 = tri_e2
        # dense tier: VALID slots only, compacted (padding slots are ~60% of
        # small scenes and would be intersected brute-force otherwise)
        self.dense_tris = dense_tris  # f32 [T, 9] v0/e1/e2 or None
        self.dense_slot = dense_slot  # i32 [T] compact → leaf-slot id
        self.bounds = bounds  # f32 [6] scene lo/hi (wavefront sort keys)
        # Alpha-cutout support (reference: optix_anyhit.cuh + device_omm.c).
        # rows_shadow: leaf rows with cutout triangles degenerated — the
        # any-hit walk sees opaque geometry only (None = no cutouts).
        # cut_tris: f32 [Tc, 12] v0/e1/e2/alpha/pad of the cutout triangles,
        # for the dense transmission pass (None = no cutouts).
        self.rows_shadow = rows_shadow
        self.cut_tris = cut_tris
        # dense_tris rides an extra alpha column: [T, 12] v0/e1/e2/alpha/pad
        self.depth = depth
        self.num_nodes = num_nodes

    @property
    def has_cutouts(self) -> bool:
        return self.cut_tris is not None

    def tree_flatten(self):
        return (
            (self.rows, self.tri_v0,
             self.tri_e1, self.tri_e2, self.dense_tris, self.dense_slot,
             self.bounds, self.rows_shadow, self.cut_tris),
            (self.depth, self.num_nodes),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0], aux[1])


class Hit(NamedTuple):
    t: jnp.ndarray  # f32 [N] — MISS_DIST on miss
    slot: jnp.ndarray  # i32 [N] — leaf-slot index, -1 on miss
    u: jnp.ndarray  # f32 [N] barycentric
    v: jnp.ndarray  # f32 [N]

    @property
    def valid(self) -> jnp.ndarray:
        return self.slot >= 0


def pack_device_bvh(wide, v0, e1, e2, slot_alpha=None,
                    slot_cut_grid=None) -> DeviceBVH:
    """WideBVH (bvh/wide.py) + slot triangles [P, 3] → DeviceBVH.

    slot_alpha (f32 [P], optional): per-slot opacity (material base alpha ×
    mean albedo-texture alpha). Slots with alpha < 1 are CUTOUT triangles:
    they are degenerated out of the shadow leaf rows (binary occlusion sees
    opaque geometry only) and collected into `cut_tris` for the dense
    transmission pass (reference: optix_anyhit transparency accumulation).

    slot_cut_grid (u16 [P, 64], optional): per-slot 8x8 barycentric-cell
    MEAN-alpha micro-grid — the TPU analog of the reference's opacity
    micromap states (device_omm.c / micromap.cuh): instead of 2-bit
    opaque/transparent/unknown states feeding hardware OMMs, each cell
    stores its local mean alpha (u16-quantized, ±8e-6), which drops
    straight into the stochastic transparency model and resolves
    partially-cut triangles (a leaf card blocks where the leaf is and
    passes where it is not, rather than applying a uniform 0.5
    everywhere). Packed as 32 bitcast f32 columns appended to `cut_tris`.

    All leaves stay numpy; the caller ships them via fast_device_put.
    """
    from ..bvh.wide import pack_leaf_rows

    wide = pack_leaf_rows(wide, v0, e1, e2)
    rows_shadow = cut_tris = None
    if slot_alpha is not None and (slot_alpha < 1.0).any():
        cut = slot_alpha < 1.0
        keep = (~cut).astype(np.float32)[:, None]
        shadow = pack_leaf_rows(wide, v0, e1 * keep, e2 * keep)
        rows_shadow = np.concatenate(
            [wide.node_rows, shadow.leaf_rows], axis=0
        )
        ids = np.nonzero(cut)[0]
        tc = (len(ids) + 7) // 8 * 8
        ncol = 44 if slot_cut_grid is not None else 12
        cut_tris = np.zeros((tc, ncol), np.float32)
        cut_tris[: len(ids), 0:3] = v0[ids]
        cut_tris[: len(ids), 3:6] = e1[ids]
        cut_tris[: len(ids), 6:9] = e2[ids]
        cut_tris[: len(ids), 9] = slot_alpha[ids]
        if slot_cut_grid is not None:
            g = np.ascontiguousarray(slot_cut_grid[ids], np.uint16)
            w32 = g.view(np.uint32).reshape(len(ids), 32)
            cut_tris[: len(ids), 12:44] = w32.view(np.float32)

    def v3(a):
        return Vec3(
            np.ascontiguousarray(a[..., 0]),
            np.ascontiguousarray(a[..., 1]),
            np.ascontiguousarray(a[..., 2]),
        )

    p = v0.shape[0]
    dense_tris = dense_slot = None
    if p <= 4 * DENSE_MAX_SLOTS:
        valid = np.nonzero(
            (np.abs(e1).sum(-1) > 0) | (np.abs(e2).sum(-1) > 0)
        )[0].astype(np.int32)
        t = max(int(valid.shape[0]), 1)
        t_pad = (t + 7) // 8 * 8
        dense_tris = np.zeros((t_pad, 12), np.float32)
        dense_tris[:, 9] = 1.0  # padding slots are opaque (and unhittable)
        dense_slot = np.zeros((t_pad,), np.int32)
        if valid.shape[0]:
            dense_tris[:t, 0:3] = v0[valid]
            dense_tris[:t, 3:6] = e1[valid]
            dense_tris[:t, 6:9] = e2[valid]
            dense_tris[:t, 9] = (
                slot_alpha[valid] if slot_alpha is not None else 1.0
            )
            dense_slot[:t] = valid
    rows = np.concatenate([wide.node_rows, wide.leaf_rows], axis=0)
    corners = np.stack([v0, v0 + e1, v0 + e2], axis=1).reshape(-1, 3)
    bounds = np.concatenate([
        corners.min(axis=0) if p else np.zeros(3, np.float32),
        corners.max(axis=0) if p else np.ones(3, np.float32),
    ]).astype(np.float32)
    return DeviceBVH(
        rows=rows,
        tri_v0=v3(v0),
        tri_e1=v3(e1),
        tri_e2=v3(e2),
        dense_tris=dense_tris,
        dense_slot=dense_slot,
        bounds=bounds,
        rows_shadow=rows_shadow,
        cut_tris=cut_tris,
        depth=int(wide.depth),
        num_nodes=int(wide.num_nodes),
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
    if any_hit:
        # binary occlusion sees opaque triangles only; cutout triangles are
        # handled by trace_transmission (reference: optix_anyhit.cuh)
        hit = hit & (tris[:, 9:10] >= 1.0)
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


# Packet-size sweep on v5e (127k-tri scene, 262k rays): 16 is the joint
# optimum (incoherent 42 ms/118 it, coherent 19 ms/50 it; 8 ray/packet is
# 1.5x slower incoherent, 32 is equal, <8 pads the sublane axis). Bigger
# packets cut gather indices; iterations (path-union divergence) grow slower
# than 1/G until ~32.
PACKET = 16


def _traverse_wide(bvh: DeviceBVH, origin: Vec3, direction: Vec3, t_max,
                   any_hit: bool, t_min: float = 1e-4, active=None,
                   debug_counters: bool = False, packet: int = PACKET,
                   shadow: bool = False):
    """16-wide BVH traversal over 8-ray packets, single uniform loop, ONE
    unified row gather per step.

    A packet is 8 consecutive rays riding the SUBLANE axis ([8, G] arrays,
    G packets in lanes): the per-step row gather is per PACKET
    ([G, 128] instead of [N, 128]) — 8x less gather traffic, the dominant
    cost. The packet follows the union of its rays' wanted children
    (per-ray slab tests reduced over the ray axis), so coherent packets
    (camera/shadow wavefronts in pixel order) pay almost nothing for
    sharing. Control state is per packet [G]; hit state per ray [8, G].

    State machine: `fetch` names the unified-table row gathered this step.
    A NODE row is slab-tested ([16 children, 8 rays, G]) and its children's
    entry distances + codes REPLACE the pending registers
    (pend_dist/pend_code [16, G]); a LEAF row is intersected inline
    ([14, 8, G] Möller-Trumbore) while the registers persist. Selection then
    picks the nearest pending child: interior → fetch it next (pushing the
    current node + remaining-children bitmask), leaf → fetch its row with the
    registers kept (the selected bit cleared) — so a node with several leaf
    children costs ONE fetch per child and zero re-fetches of the node
    itself. An empty pending set pops the stack, re-fetching the popped node
    with its saved bitmask as `restore` (re-slab next step). Pending children
    whose entry distance exceeds every live ray's current t_best are pruned
    each step (ordered descent makes this effective for closest-hit).

    Every unrolled per-child / per-triangle loop is a single 3D tensor op:
    measured on v5e, each XLA op inside a while_loop body costs ~5 us fixed,
    so the op count per body dominates below ~100 MB of traffic. Per-lane
    dynamic indexing never happens: selection uses one-hot sums over the
    [16, G] register arrays, the stack uses concat-shifts.
    """
    rows = (
        bvh.rows_shadow
        if (shadow and bvh.rows_shadow is not None)
        else bvh.rows
    )
    m_nodes = int(bvh.num_nodes)  # static
    stack_depth = max(int(bvh.depth), 1)
    n_in = origin.x.shape[0]
    if active is None:
        active = jnp.ones((n_in,), bool)

    # Pad the wavefront to a packet multiple with inactive rays.
    pad = (-n_in) % packet
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
    g = n // packet

    def to_pg(x):  # [N] -> [packet, G]
        return x.reshape(g, packet).T

    o_pg = Vec3(to_pg(origin.x), to_pg(origin.y), to_pg(origin.z))
    d_pg = Vec3(to_pg(direction.x), to_pg(direction.y), to_pg(direction.z))
    inv_pg = _safe_inv(d_pg)
    ray_on = to_pg(active)  # [8, G]

    inf = jnp.float32(np.inf)
    kid_iota = jax.lax.broadcasted_iota(jnp.int32, (BRANCH, 1), 0)  # [16, 1]
    full_mask = jnp.int32((1 << BRANCH) - 1)

    fetch = jnp.zeros((g,), jnp.int32)  # root
    fetch_leaf = jnp.zeros((g,), bool)
    restore = jnp.full((g,), full_mask, jnp.int32)
    cur_node = jnp.zeros((g,), jnp.int32)
    pend_dist = jnp.full((BRANCH, g), inf, jnp.float32)
    pend_code = jnp.zeros((BRANCH, g), jnp.int32)
    sp = jnp.zeros((g,), jnp.int32)
    stack_node = jnp.zeros((stack_depth, g), jnp.int32)
    stack_mask = jnp.zeros((stack_depth, g), jnp.int32)
    done = ~jnp.any(ray_on, axis=0)  # all-inactive packets are born done
    t_best = to_pg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)))
    # Winning LEAF ROW id per ray (-1 = none). The in-loop argmin over
    # [14, 16, G] that used to produce the triangle index cost ~18% of the
    # body (profiled iota_reduce fusions); the winning leaf is re-intersected
    # once after the loop instead.
    leaf_best = jnp.full((packet, g), -1, jnp.int32)
    found = jnp.zeros((packet, g), bool)  # any-hit early-out per ray

    def cond(st):
        return jnp.any(~st[8])

    def body(st):
        (fetch, fetch_leaf, restore, cur_node, pend_dist, pend_code,
         sp, stack_node, stack_mask, done, t_best, leaf_best, found) = (
            st[0], st[1], st[2], st[3], st[4], st[5], st[6], st[7][0],
            st[7][1], st[8], st[9], st[10], st[11])
        act = ~done
        rowT = rows[jnp.where(act, fetch, 0)].T  # [128, G] — THE gather

        ray_live = ray_on & ~found & act[None, :]  # [8, G]

        # --- node interpretation: slab 16 children x 8 rays ---
        lo_x, hi_x = rowT[0:16], rowT[16:32]      # [16, G] per child
        lo_y, hi_y = rowT[32:48], rowT[48:64]
        lo_z, hi_z = rowT[64:80], rowT[80:96]
        codes = jax.lax.bitcast_convert_type(rowT[96:112], jnp.int32)
        ox, oy, oz = o_pg.x[None], o_pg.y[None], o_pg.z[None]
        ix, iy, iz = inv_pg.x[None], inv_pg.y[None], inv_pg.z[None]
        t1x = (lo_x[:, None, :] - ox) * ix        # [16, 8, G]
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
        ok = (enter <= leave) & ray_live[None]              # [16, 8, G]
        in_restore = ((restore[None, :] >> kid_iota) & 1) == 1
        if any_hit:
            # unordered walk: no entry distances needed, any hit child gets
            # dist 0 — selection degenerates to "first pending" and the
            # t_best pruning below is skipped (shadow rays have no ordering)
            dist16 = jnp.where(jnp.any(ok, axis=1), 0.0, inf)  # [16, G]
        else:
            dist16 = jnp.min(jnp.where(ok, enter, inf), axis=1)  # [16, G]
        new_dist = jnp.where(
            in_restore & (codes != INVALID_CHILD), dist16, inf
        )

        is_node_step = act & ~fetch_leaf
        pend_dist = jnp.where(is_node_step[None, :], new_dist, pend_dist)
        pend_code = jnp.where(is_node_step[None, :], codes, pend_code)
        cur_node = jnp.where(is_node_step, fetch, cur_node)

        # --- leaf interpretation: [14, 8, G] M-T on the same row ---
        tv0 = Vec3(rowT[0:14, None, :], rowT[14:28, None, :],
                   rowT[28:42, None, :])
        te1 = Vec3(rowT[42:56, None, :], rowT[56:70, None, :],
                   rowT[70:84, None, :])
        te2 = Vec3(rowT[84:98, None, :], rowT[98:112, None, :],
                   rowT[112:126, None, :])
        o3 = Vec3(ox, oy, oz)
        d3 = Vec3(d_pg.x[None], d_pg.y[None], d_pg.z[None])
        t, u, v, tri_hit = ray_triangle(o3, d3, tv0, te1, te2, t_min=t_min)
        leaf_live = ray_live & (act & fetch_leaf)[None, :]
        t = jnp.where(tri_hit & leaf_live[None], t, inf)    # [14, 8, G]
        t14 = jnp.min(t, axis=0)                            # [8, G]
        better = t14 < t_best
        t_best = jnp.where(better, t14, t_best)
        # Only the winning LEAF ROW is tracked; the triangle index (and u/v)
        # come from one post-loop re-intersection of that row — an in-loop
        # argmin over [14, 16, G] profiled at ~18% of the body.
        leaf_best = jnp.where(better, fetch[None, :], leaf_best)
        if any_hit:
            found = found | better
            ray_live = ray_live & ~found
            done = done | ~jnp.any(ray_on & ~found, axis=0)
        else:
            # --- prune pending vs the packet's live-ray t_best ceiling ---
            t_pack = jnp.max(jnp.where(ray_live, t_best, -inf), axis=0)  # [G]
            pend_dist = jnp.where(pend_dist > t_pack[None, :], inf, pend_dist)

        # --- select the nearest pending child ---
        sel_dist = jnp.min(pend_dist, axis=0)               # [G]
        sel = jnp.argmin(pend_dist, axis=0).astype(jnp.int32)
        any_pend = sel_dist < inf
        onehot = kid_iota == sel[None, :]                   # [16, G]
        sel_code = jnp.sum(jnp.where(onehot, pend_code, 0), axis=0)
        go = act & any_pend
        pend_dist = jnp.where(onehot & go[None, :], inf, pend_dist)

        is_leaf_next = sel_code < 0
        fetch_n = jnp.where(is_leaf_next, m_nodes + ~sel_code, sel_code)
        remaining = jnp.sum(
            jnp.where(pend_dist < inf, jnp.int32(1) << kid_iota, 0), axis=0
        )
        push = go & ~is_leaf_next & (remaining != 0)

        # --- push (concat-shift down; row 0 is the top) ---
        stack_node = jnp.where(
            push[None, :],
            jnp.concatenate([cur_node[None, :], stack_node[:-1]], axis=0),
            stack_node,
        )
        stack_mask = jnp.where(
            push[None, :],
            jnp.concatenate([remaining[None, :], stack_mask[:-1]], axis=0),
            stack_mask,
        )
        sp = jnp.where(push, sp + 1, sp)

        # --- pop (concat-shift up) ---
        can_pop = act & ~any_pend & (sp > 0)
        top_node = stack_node[0]
        top_mask = stack_mask[0]
        stack_node = jnp.where(
            can_pop[None, :],
            jnp.concatenate([stack_node[1:], stack_node[-1:]], axis=0),
            stack_node,
        )
        stack_mask = jnp.where(
            can_pop[None, :],
            jnp.concatenate([stack_mask[1:], stack_mask[-1:]], axis=0),
            stack_mask,
        )
        sp = jnp.where(can_pop, sp - 1, sp)
        done = done | (act & ~any_pend & ~can_pop)

        fetch = jnp.where(go, fetch_n, fetch)
        fetch = jnp.where(can_pop, top_node, fetch)
        fetch_leaf = jnp.where(act, go & is_leaf_next, fetch_leaf)
        restore = jnp.where(can_pop, top_mask, full_mask)
        return (fetch, fetch_leaf, restore, cur_node, pend_dist, pend_code,
                sp, (stack_node, stack_mask), done, t_best, leaf_best, found)

    st = (fetch, fetch_leaf, restore, cur_node, pend_dist, pend_code,
          sp, (stack_node, stack_mask), done, t_best, leaf_best, found)
    if debug_counters:
        # counters: (iterations, packet-active steps, leaf steps) — the
        # utilization diagnosis: avg visits/packet = active/G, lockstep
        # waste = 1 - active/(iters*G).
        def body2(cs):
            c, s = cs
            act_packets = jnp.sum((~s[8]).astype(jnp.int32))
            leaf_steps = jnp.sum((s[1] & ~s[8]).astype(jnp.int32))
            return ((c[0] + 1, c[1] + act_packets, c[2] + leaf_steps),
                    body(s))
        counters, st = jax.lax.while_loop(
            lambda cs: cond(cs[1]), body2,
            ((jnp.int32(0), jnp.int32(0), jnp.int32(0)), st)
        )
    else:
        st = jax.lax.while_loop(cond, body, st)
    t_best, leaf_best = st[9], st[10]

    def from_pg(x):  # [packet, G] -> [N_in]
        return x.T.reshape(n)[:n_in]

    if any_hit:  # occlusion callers only read slot >= 0
        found_out = from_pg(st[11])
        z = jnp.zeros((n_in,), jnp.float32)
        hit = Hit(
            t=jnp.where(found_out, z, MISS_DIST),
            slot=jnp.where(found_out, 0, -1),
            u=z,
            v=z,
        )
        if debug_counters:
            return hit, counters
        return hit

    # Re-intersect the winning leaf row once: yields the triangle index,
    # barycentrics, and the hit slot (one [N, 128] gather + [14, N] M-T).
    leaf_out = from_pg(leaf_best)
    valid = leaf_out >= 0
    t_out = jnp.where(valid, from_pg(t_best), MISS_DIST)
    rowT2 = rows[jnp.where(valid, leaf_out, m_nodes)].T  # [128, N]
    o1 = Vec3(origin.x[:n_in][None], origin.y[:n_in][None],
              origin.z[:n_in][None])
    d1 = Vec3(direction.x[:n_in][None], direction.y[:n_in][None],
              direction.z[:n_in][None])
    tv0 = Vec3(rowT2[0:14], rowT2[14:28], rowT2[28:42])      # [14, N]
    te1 = Vec3(rowT2[42:56], rowT2[56:70], rowT2[70:84])
    te2 = Vec3(rowT2[84:98], rowT2[98:112], rowT2[112:126])
    t2, u2, v2, hit2 = ray_triangle(o1, d1, tv0, te1, te2, t_min=t_min)
    t2 = jnp.where(hit2, t2, jnp.float32(np.inf))
    k = jnp.argmin(t2, axis=0).astype(jnp.int32)             # [N]
    oh = jax.lax.broadcasted_iota(jnp.int32, (WIDE_LEAF, 1), 0) == k[None, :]
    u_out = jnp.sum(jnp.where(oh, u2, 0.0), axis=0)
    v_out = jnp.sum(jnp.where(oh, v2, 0.0), axis=0)
    slot_out = jnp.where(
        valid, (leaf_out - m_nodes) * WIDE_LEAF + k, -1
    )
    u_out = jnp.where(valid, u_out, 0.0)
    v_out = jnp.where(valid, v_out, 0.0)
    hit = Hit(t=t_out, slot=slot_out, u=u_out, v=v_out)
    if debug_counters:
        return hit, counters
    return hit


def _chunked(fn, n_rays: int, chunk: int | None, args):
    """Run fn over rays in fixed-size chunks via lax.map, flattening back.

    The chunk is capped at TRACE_CHUNK: the while_loop runs to the slowest
    packet of its chunk, so bounded chunks bound the lockstep tail (measured
    1.8x on 1M incoherent rays). Ray counts that don't divide evenly are
    padded with inactive lanes.
    """
    chunk = min(chunk if chunk is not None else n_rays, TRACE_CHUNK)
    if n_rays <= chunk:
        return fn(args)
    pad = (-n_rays) % chunk
    if pad:
        def padx(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
            )
        args = jax.tree_util.tree_map(padx, args)
    n_pad = n_rays + pad
    reshaped = jax.tree_util.tree_map(
        lambda x: x.reshape((n_pad // chunk, chunk) + x.shape[1:]), args
    )
    out = jax.lax.map(fn, reshaped)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_pad,) + x.shape[2:])[:n_rays], out
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
        elif _use_pallas():
            from .traverse_pallas import traverse_wide_pallas

            hit = traverse_wide_pallas(bvh, o, d, tm, any_hit=False,
                                       active=act)
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
                                    debug_counters=True, shadow=True)
            jax.debug.print("any-hit trace: {i} iters", i=c[0])
        elif _use_pallas():
            from .traverse_pallas import traverse_wide_pallas

            hit = traverse_wide_pallas(bvh, o, d, tm, any_hit=True,
                                       active=act, shadow=True)
        else:
            hit = _traverse_wide(bvh, o, d, tm, any_hit=True, active=act,
                                 shadow=True)
        return act & (hit.slot >= 0)

    return _chunked(run, n, chunk, (origin, direction, t_max, active))


def trace_transmission(
    bvh: DeviceBVH,
    origin: Vec3,
    direction: Vec3,
    t_max,
    chunk: int | None = None,
    active=None,
) -> jnp.ndarray:
    """Transparency factor through CUTOUT geometry: prod(1 - alpha) over all
    cutout triangles crossed within t_max (1.0 = clear path).

    Combined with trace_occluded (which sees opaque geometry only) this
    reproduces the reference's any-hit transparency accumulation
    (optix_anyhit.cuh) with the per-triangle mean alpha standing in for the
    opacity-micromap states (device_omm.c). Cutout sets are small (foliage
    cards), so a dense [Tc, N] pass beats a tree walk.
    """
    n = origin.x.shape[0]
    if bvh.cut_tris is None:
        return jnp.ones((n,), jnp.float32)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is None:
        active = jnp.ones((n,), bool)

    def run(args):
        o, d, tm, act = args
        tris = bvh.cut_tris
        o2 = Vec3(o.x[None, :], o.y[None, :], o.z[None, :])
        d2 = Vec3(d.x[None, :], d.y[None, :], d.z[None, :])
        tv = Vec3(tris[:, 0:1], tris[:, 1:2], tris[:, 2:3])
        te1 = Vec3(tris[:, 3:4], tris[:, 4:5], tris[:, 5:6])
        te2 = Vec3(tris[:, 6:7], tris[:, 7:8], tris[:, 8:9])
        t, u, v, hit = ray_triangle(o2, d2, tv, te1, te2, t_min=1e-4)
        within = hit & (t <= tm[None, :]) & act[None, :]
        if tris.shape[1] >= 44:
            # micro-alpha grid (OMM analog): local mean alpha of the 8x8
            # barycentric cell the ray crosses, not the whole-triangle mean
            s_i = jnp.clip((u * 8.0).astype(jnp.int32), 0, 7)
            t_i = jnp.clip((v * 8.0).astype(jnp.int32), 0, 7)
            cell = t_i * 8 + s_i  # [C, N]
            words = jax.lax.bitcast_convert_type(
                tris[:, 12:44], jnp.int32)  # [C, 32]
            w = jnp.take_along_axis(words, cell >> 1, axis=1)
            alpha = ((w >> ((cell & 1) * 16)) & 0xFFFF).astype(
                jnp.float32) / 65535.0
        else:
            alpha = tris[:, 9:10]
        return jnp.prod(jnp.where(within, 1.0 - alpha, 1.0), axis=0)

    return _chunked(run, n, chunk, (origin, direction, t_max, active))
