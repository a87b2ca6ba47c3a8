"""Pallas fused-body BVH traversal (the round-3/4 performance kernel).

The XLA `_traverse_wide` loop body (ops/traverse.py) was measured at
~2.2 ms/iteration (G = 65k packets) of which only ~0.29 ms is the row gather
plus the slab math — the rest is transposes, unfused while-body
intermediates, iota/argmin reduction fusions, and loop-carry copies
(docs/PERF_NOTES.md "Traversal cost decomposition"). Mosaic cannot do
per-lane row gathers from VMEM (verified: jnp.take / take_along_axis /
vector indexing all fail to lower — tools/proto_pallas_gather.py), so the
mega-kernel design in the reference's dormant CWBVH traversal
(reference: src/luminary/device/cuda/bvh.cuh:1-384 — per-thread stack
pointer chasing) cannot be transplanted directly. The hybrid keeps what
each level is good at:

  * XLA while_loop + row gather: `rows[fetch]` is bandwidth-bound
    (~211 GB/s measured) — XLA's native gather machinery beats anything
    Pallas can emit for this.
  * ONE Pallas kernel per iteration fuses the ENTIRE body: 16-child slab
    test, 14-triangle Möller-Trumbore, pending-child selection, stack
    push/pop — all intermediates live in VREGs/VMEM, state flows through
    input_output_aliases, layout is lanes-major ([*, G], packets on lanes).

Round-4 rework — the fused body is DMA-streaming-bound (~2.3 KB of state
per packet per iteration) and the lockstep tail wastes ~63% of it
(utilization was measured at 37%), so:

  * NESTED-LOOP COMPACTION: the XLA while_loop became
    while(any active): { argsort packets by (done, fetch_leaf);
                         fori_loop(SORT_EVERY): fused body }
    Round 3 ran the sort under lax.cond inside a flat loop and LOST
    20-45% — the cond forced full carry copies every iteration. The
    nested structure runs the sort unconditionally once per SORT_EVERY
    iterations: no cond, no copies.
  * Done packets compact to a suffix; a scalar-prefetch block count
    (`nblk`) redirects all fully-done suffix blocks onto one block index,
    so Pallas elides their DMA entirely (revisited block indices are not
    re-fetched / re-flushed), and their compute is skipped by the
    per-block @pl.when guards.
  * State slimming: inverse directions are recomputed in-kernel (48 rows
    saved), the closest and any-hit variants share one 16-row aux block
    (leaf_best / found — each variant uses exactly one), and the
    un-permute key lives in a [G] i32 XLA-side array instead of 16
    broadcast rows.
  * ONE carried state array: the i32 control/stack rows and the f32
    distance rows live in a single i32 table (f32 rows bitcast). Each
    compaction permute (transpose + row gather + transpose) then moves 2
    arrays instead of 3, and the kernel aliases one in/out pair — the
    permutes measured ~250 ms/sample at 1080p before the merge.

State packing (per G packets, PACKET=16 rays each), one i32 [SI, G] table:
  rows 0:8     ctl = fetch / fetch_leaf / restore / cur_node / sp / done /
                pad / pad
  rows 8:24    pend_code
  rows 24:40   aux: leaf_best (closest) | found (any-hit)
  rows 40:56   pend_dist  (f32 bitcast)
  rows 56:72   t_best     (f32 bitcast)
  rows 72:72+D      stack_node   (D = stack depth, padded to mult of 8)
  rows 72+D:72+2D   stack_mask
  rays f32 [112, G]: o.xyz / d.xyz (16 rows each) + rows 96:112 ray_on
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import MISS_DIST
from .vec import Vec3

BRANCH = 16
PACKET = 16
WIDE_LEAF = 14
INVALID_CHILD = np.int32(0x7FFFFFFF)

# Lane-axis block per pallas grid step. 512 keeps the [16, 16, GB] slab
# intermediates at 512 KB each so the working set stays inside VMEM.
# Env knob for on-chip A/B (1024 halves grid dispatches but coarsens the
# nblk done-block elision and section homogeneity).
GB = int(os.environ.get("LUM_TRAV_GB", "512"))

# Cruise fori length between packet compactions (after the fixed 4, 8
# warmup rounds). Each compaction is one argsort + two row-matrix permutes
# (~90 us at G=8192); between compactions done packets cost only
# elided-DMA revisits. Round 4 measured 16 as +3.5% over 8; with the
# round-5 multi-phase width shrink the balance flipped (compaction now
# also feeds the phase switches): 8 measured 1132 vs 1156 ms/sample on
# the tree-tier 1080p bench.
SORT_EVERY = int(os.environ.get("LUM_TRAV_SORT_EVERY", "8"))

# Keep the per-iteration row gather in [G, 128] layout and transpose inside
# the kernel: the gather's row DMAs stay contiguous and the 4 MB XLA
# relayout per iteration disappears. Measured on the tree-tier 1080p bench:
# 3250 → 3044 ms/sample (-6%). Env A/B flag kept for re-measurement.
ROW_MAJOR = os.environ.get("LUM_TRAV_ROWMAJOR", "1") == "1"

# f32-bitcast row offsets inside the merged i32 state table
_PD0 = 40  # pend_dist rows 40:56
_TB0 = 56  # t_best rows 56:72
_ST0 = 72  # stack rows


def _pad8(d: int) -> int:
    return (d + 7) // 8 * 8


def _f32(rows):
    return jax.lax.bitcast_convert_type(rows, jnp.float32)


def _i32(rows):
    return jax.lax.bitcast_convert_type(rows, jnp.int32)


def _make_body_kernel(any_hit: bool, m_nodes: int, d_pad: int, t_min: float,
                      row_major: bool = False):
    """The fused traversal-body kernel (one XLA while iteration).

    Section structure (each skippable per block):
      default : copy input state -> output state
      slab    : node interpretation, updates pend_dist/pend_code/cur_node
      MT      : leaf interpretation, updates t_best + leaf_best (closest)
                or found/done (any-hit), + pending prune (closest)
      select  : pending-child selection + stack push/pop, updates ctl/stack
    The select section reads what slab/MT wrote, so all sections do masked
    read-modify-write on the OUTPUT ref (seeded by the default copy).
    """
    inf = np.float32(np.inf)
    s_node0 = _ST0
    s_mask0 = _ST0 + d_pad

    def kernel(nblk_ref, st_ref, rays_ref, rowt_ref, ost_ref):
        real_blk = pl.program_id(0) < nblk_ref[0]

        # --- default: pass state through ---
        ost_ref[:] = st_ref[:]

        ctl = st_ref[0:8]                       # [8, GB]
        done = ctl[5:6] != 0                    # [1, GB]
        fetch_leaf = ctl[1:2] != 0
        act = ~done
        any_active = real_blk & jnp.any(act)
        has_node = any_active & jnp.any(act & ~fetch_leaf)
        has_leaf = any_active & jnp.any(act & fetch_leaf)

        kid_iota = jax.lax.broadcasted_iota(jnp.int32, (BRANCH, 1), 0)

        def _rowT():
            # row_major: the gather stays [G, 128] at XLA level (contiguous
            # row DMAs, no 4 MB HBM relayout per iteration) and each active
            # section transposes its block in VMEM instead.
            return rowt_ref[:].T if row_major else rowt_ref[:]

        def _ray_live():
            ray_on = rays_ref[96:112] > 0.0
            if any_hit:
                found = st_ref[24:40] != 0
                return ray_on & ~found & act
            return ray_on & act

        @pl.when(has_node)
        def _slab_section():
            rowT = _rowT()                      # [128, GB]
            fetch = st_ref[0:1]
            restore = st_ref[2:3]
            ox = rays_ref[0:16]
            oy = rays_ref[16:32]
            oz = rays_ref[32:48]

            def inv(c):
                # matches ops.traverse._safe_inv: clamp zero components so
                # the slab test never sees 0 * inf NaNs
                tiny = np.float32(1e-20)
                safe = jnp.where(jnp.abs(c) < tiny,
                                 jnp.where(c < 0.0, -tiny, tiny), c)
                return 1.0 / safe

            ivx = inv(rays_ref[48:64])
            ivy = inv(rays_ref[64:80])
            ivz = inv(rays_ref[80:96])
            t_best = _f32(st_ref[_TB0:_TB0 + 16])
            ray_live = _ray_live()              # [16, GB]

            lo_x, hi_x = rowT[0:16], rowT[16:32]
            lo_y, hi_y = rowT[32:48], rowT[48:64]
            lo_z, hi_z = rowT[64:80], rowT[80:96]
            codes = jax.lax.bitcast_convert_type(rowT[96:112], jnp.int32)
            t1x = (lo_x[:, None, :] - ox[None]) * ivx[None]  # [16, 16, GB]
            t2x = (hi_x[:, None, :] - ox[None]) * ivx[None]
            t1y = (lo_y[:, None, :] - oy[None]) * ivy[None]
            t2y = (hi_y[:, None, :] - oy[None]) * ivy[None]
            t1z = (lo_z[:, None, :] - oz[None]) * ivz[None]
            t2z = (hi_z[:, None, :] - oz[None]) * ivz[None]
            enter = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.maximum(jnp.minimum(t1z, t2z), jnp.float32(t_min)),
            )
            leave = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.minimum(jnp.maximum(t1z, t2z), t_best[None]),
            )
            ok = (enter <= leave) & ray_live[None]           # [16, 16, GB]
            in_restore = ((restore >> kid_iota) & 1) == 1    # [16, GB]
            if any_hit:
                dist16 = jnp.where(jnp.any(ok, axis=1), 0.0, inf)
            else:
                dist16 = jnp.min(jnp.where(ok, enter, inf), axis=1)
            new_dist = jnp.where(in_restore & (codes != INVALID_CHILD),
                                 dist16, inf)

            is_node_step = act & ~fetch_leaf                 # [1, GB]
            ost_ref[_PD0:_PD0 + 16] = jnp.where(
                is_node_step, _i32(new_dist), st_ref[_PD0:_PD0 + 16])
            ost_ref[8:24] = jnp.where(is_node_step, codes, st_ref[8:24])
            ost_ref[3:4] = jnp.where(is_node_step, fetch, st_ref[3:4])

        @pl.when(has_leaf)
        def _mt_section():
            rowT = _rowT()
            fetch = st_ref[0:1]
            ox = rays_ref[0:16]
            oy = rays_ref[16:32]
            oz = rays_ref[32:48]
            dx = rays_ref[48:64]
            dy = rays_ref[64:80]
            dz = rays_ref[80:96]
            t_best = _f32(st_ref[_TB0:_TB0 + 16])
            ray_live = _ray_live()

            v0x, v0y, v0z = rowT[0:14], rowT[14:28], rowT[28:42]
            e1x, e1y, e1z = rowT[42:56], rowT[56:70], rowT[70:84]
            e2x, e2y, e2z = rowT[84:98], rowT[98:112], rowT[112:126]
            dxb, dyb, dzb = dx[None], dy[None], dz[None]     # [1, 16, GB]
            pvx = dyb * e2z[:, None, :] - dzb * e2y[:, None, :]
            pvy = dzb * e2x[:, None, :] - dxb * e2z[:, None, :]
            pvz = dxb * e2y[:, None, :] - dyb * e2x[:, None, :]
            det = (e1x[:, None, :] * pvx + e1y[:, None, :] * pvy
                   + e1z[:, None, :] * pvz)
            parallel = jnp.abs(det) < 1e-12
            inv_det = 1.0 / jnp.where(parallel, 1.0, det)
            tvx = ox[None] - v0x[:, None, :]
            tvy = oy[None] - v0y[:, None, :]
            tvz = oz[None] - v0z[:, None, :]
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z[:, None, :] - tvz * e1y[:, None, :]
            qvy = tvz * e1x[:, None, :] - tvx * e1z[:, None, :]
            qvz = tvx * e1y[:, None, :] - tvy * e1x[:, None, :]
            v = (dxb * qvx + dyb * qvy + dzb * qvz) * inv_det
            t = (e2x[:, None, :] * qvx + e2y[:, None, :] * qvy
                 + e2z[:, None, :] * qvz) * inv_det
            tri_hit = ((~parallel) & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > t_min))
            leaf_live = ray_live & (act & fetch_leaf)        # [16, GB]
            t = jnp.where(tri_hit & leaf_live[None], t, inf)
            t14 = jnp.min(t, axis=0)                         # [16, GB]
            better = t14 < t_best
            t_best = jnp.where(better, t14, t_best)
            ost_ref[_TB0:_TB0 + 16] = _i32(t_best)
            if any_hit:
                found2 = (st_ref[24:40] != 0) | better
                ost_ref[24:40] = found2.astype(jnp.int32)
                ray_on = rays_ref[96:112] > 0.0
                done2 = done | ~jnp.any(ray_on & ~found2, axis=0,
                                        keepdims=True)
                ost_ref[5:6] = done2.astype(jnp.int32)
            else:
                ost_ref[24:40] = jnp.where(better, fetch, st_ref[24:40])
                # prune pending vs the packet's live-ray t_best ceiling
                t_pack = jnp.max(jnp.where(ray_live, t_best, -inf),
                                 axis=0, keepdims=True)      # [1, GB]
                pend = _f32(ost_ref[_PD0:_PD0 + 16])
                ost_ref[_PD0:_PD0 + 16] = _i32(
                    jnp.where(pend > t_pack, inf, pend))

        @pl.when(any_active)
        def _select_section():
            # reads the post-slab/MT state from the OUTPUT ref
            fetch = ost_ref[0:1]
            fetch_leaf2 = ost_ref[1:2] != 0
            cur_node = ost_ref[3:4]
            sp = ost_ref[4:5]
            done2 = ost_ref[5:6] != 0
            pend_dist = _f32(ost_ref[_PD0:_PD0 + 16])
            pend_code = ost_ref[8:24]
            stack_node = ost_ref[s_node0:s_node0 + d_pad]
            stack_mask = ost_ref[s_mask0:s_mask0 + d_pad]
            act2 = ~done2 if any_hit else act

            sel_dist = jnp.min(pend_dist, axis=0, keepdims=True)  # [1, GB]
            at_min = pend_dist == sel_dist
            sel = jnp.min(jnp.where(at_min, kid_iota, BRANCH), axis=0,
                          keepdims=True)
            any_pend = sel_dist < inf
            onehot = kid_iota == sel                              # [16, GB]
            sel_code = jnp.sum(jnp.where(onehot, pend_code, 0), axis=0,
                               keepdims=True)
            go = act2 & any_pend
            pend_dist = jnp.where(onehot & go, inf, pend_dist)

            is_leaf_next = sel_code < 0
            fetch_n = jnp.where(is_leaf_next, m_nodes + ~sel_code, sel_code)
            remaining = jnp.sum(
                jnp.where(pend_dist < inf, jnp.int32(1) << kid_iota, 0),
                axis=0, keepdims=True)
            push = go & ~is_leaf_next & (remaining != 0)

            stack_node = jnp.where(
                push, jnp.concatenate([cur_node, stack_node[:-1]], axis=0),
                stack_node)
            stack_mask = jnp.where(
                push, jnp.concatenate([remaining, stack_mask[:-1]], axis=0),
                stack_mask)
            sp = jnp.where(push, sp + 1, sp)

            can_pop = act2 & ~any_pend & (sp > 0)
            top_node = stack_node[0:1]
            top_mask = stack_mask[0:1]
            stack_node = jnp.where(
                can_pop,
                jnp.concatenate([stack_node[1:], stack_node[-1:]], axis=0),
                stack_node)
            stack_mask = jnp.where(
                can_pop,
                jnp.concatenate([stack_mask[1:], stack_mask[-1:]], axis=0),
                stack_mask)
            sp = jnp.where(can_pop, sp - 1, sp)
            done3 = done2 | (act2 & ~any_pend & ~can_pop)

            fetch = jnp.where(go, fetch_n, fetch)
            fetch = jnp.where(can_pop, top_node, fetch)
            # NB: Mosaic cannot lower select with BOOL operands — keep the
            # fetch_leaf flag i32 through the where.
            fetch_leaf_i = jnp.where(
                act2, (go & is_leaf_next).astype(jnp.int32),
                fetch_leaf2.astype(jnp.int32))
            full_mask = jnp.full_like(fetch, (1 << BRANCH) - 1)
            restore = jnp.where(can_pop, top_mask, full_mask)

            ost_ref[0:1] = fetch
            ost_ref[1:2] = fetch_leaf_i
            ost_ref[2:3] = restore
            ost_ref[3:4] = cur_node
            ost_ref[4:5] = sp
            ost_ref[5:6] = done3.astype(jnp.int32)
            ost_ref[s_node0:s_node0 + d_pad] = stack_node
            ost_ref[s_mask0:s_mask0 + d_pad] = stack_mask
            ost_ref[_PD0:_PD0 + 16] = _i32(pend_dist)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "m_nodes", "d_pad", "t_min", "interpret",
                     "row_major"),
)
def _run_body(nblk, st, rays, rowT, *, any_hit, m_nodes, d_pad,
              t_min, interpret, row_major=False):
    g = rowT.shape[0] if row_major else rowT.shape[1]
    si = _ST0 + 2 * d_pad
    grid = g // GB
    kernel = _make_body_kernel(any_hit, m_nodes, d_pad, t_min,
                               row_major=row_major)

    def imap(i, nblk_ref):
        return (0, jnp.minimum(i, nblk_ref[0]))

    def imap_rows(i, nblk_ref):
        return (jnp.minimum(i, nblk_ref[0]), 0)

    row_spec = (pl.BlockSpec((GB, 128), imap_rows, memory_space=pltpu.VMEM)
                if row_major else
                pl.BlockSpec((128, GB), imap, memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((si, GB), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((112, GB), imap, memory_space=pltpu.VMEM),
            row_spec,
        ],
        out_specs=[
            pl.BlockSpec((si, GB), imap, memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((si, g), jnp.int32),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(nblk, st, rays, rowT)[0]


def _permute_cols(a, perm):
    """Permute the LANE axis of [R, G] via transpose + row gather (XLA
    column gathers are strided and slow). Both transposes ride the
    one-pass Pallas block kernels — the XLA relayout costs ~10 passes
    (tools/microbench_colext.py pattern B)."""
    from .rowops import planar, unplanar

    return planar(unplanar(a)[perm])


def traverse_wide_pallas(bvh, origin: Vec3, direction: Vec3, t_max,
                         any_hit: bool, t_min: float = 1e-4, active=None,
                         shadow: bool = False, interpret: bool = False,
                         sort_every: int = SORT_EVERY):
    """Drop-in replacement for ops.traverse._traverse_wide (PACKET=16 only).

    Same state machine and numerics as the XLA path; the body runs as one
    fused Pallas kernel per while iteration, with packet compaction once
    per `sort_every` iterations (see module docstring). `interpret=True`
    runs the kernel in the Pallas interpreter (CPU correctness tests).
    `sort_every=0` disables compaction (flat while loop)."""
    from .traverse import Hit  # local import to avoid a cycle

    rows = (bvh.rows_shadow if (shadow and bvh.rows_shadow is not None)
            else bvh.rows)
    m_nodes = int(bvh.num_nodes)
    d_pad = _pad8(max(int(bvh.depth), 1))
    n_in = origin.x.shape[0]
    if active is None:
        active = jnp.ones((n_in,), bool)

    # Pad the wavefront to a full GB*PACKET multiple with inactive rays.
    pad = (-n_in) % (PACKET * GB)
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
    nblocks = g // GB

    def to_pg(x):  # [N] -> [PACKET, G]
        return x.reshape(g, PACKET).T

    o_pg = Vec3(to_pg(origin.x), to_pg(origin.y), to_pg(origin.z))
    d_pg = Vec3(to_pg(direction.x), to_pg(direction.y), to_pg(direction.z))
    ray_on = to_pg(active)

    rays = jnp.concatenate([
        o_pg.x, o_pg.y, o_pg.z, d_pg.x, d_pg.y, d_pg.z,
        ray_on.astype(jnp.float32),
    ], axis=0)                                            # [112, G]

    si = _ST0 + 2 * d_pad
    full_mask = np.int32((1 << BRANCH) - 1)
    done0 = ~jnp.any(ray_on, axis=0)
    st = jnp.zeros((si, g), jnp.int32)
    st = st.at[2].set(full_mask)                          # restore
    st = st.at[5].set(done0.astype(jnp.int32))            # done
    if not any_hit:
        st = st.at[24:40].set(-1)                         # leaf_best
    t_best0 = to_pg(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)))
    st = st.at[_PD0:_PD0 + 16].set(
        jax.lax.bitcast_convert_type(
            jnp.full((16, g), np.inf, jnp.float32), jnp.int32))
    st = st.at[_TB0:_TB0 + 16].set(
        jax.lax.bitcast_convert_type(t_best0, jnp.int32))
    orig_g = jnp.arange(g, dtype=jnp.int32)
    nblk0 = jnp.asarray([nblocks], jnp.int32)

    run1 = functools.partial(
        _run_body, any_hit=any_hit, m_nodes=m_nodes, d_pad=d_pad,
        t_min=t_min, interpret=interpret, row_major=ROW_MAJOR)

    def fetch_rows(st):
        fetch = jnp.where(st[5] == 0, st[0], 0)
        return rows[fetch] if ROW_MAJOR else rows[fetch].T

    if sort_every:
        # [compact; fused bodies] rounds: two statically-unrolled warmup
        # rounds at cadence 4 then 8 before the while loop cruises at
        # `sort_every`. Short walks (bounded shadow segments finish in
        # ~4-8 iterations) exit at a warmup boundary instead of paying a
        # full `sort_every`-length round — a flat cadence of 16 measured
        # +3.5% on long walks but 1.7x on occl(t<5) (round 4).
        def compact(st, rays, orig_g):
            # stable argsort: active packets first (nodes before leaves so
            # post-sort blocks stay section-homogeneous), done compact to
            # the suffix whose blocks nblk elides entirely
            key = st[5] * 2 + st[1]
            perm = jnp.argsort(key, stable=True)
            st = _permute_cols(st, perm)
            rays = _permute_cols(rays, perm)
            orig_g = orig_g[perm]
            n_act = jnp.sum((st[5] == 0).astype(jnp.int32))
            nblk = jnp.maximum((n_act + GB - 1) // GB, 1).reshape(1)
            return st, rays, orig_g, nblk

        def rounds(k):
            def body(s):
                st, rays, orig_g = s
                st, rays, orig_g, nblk = compact(st, rays, orig_g)

                def inner(_, st):
                    return run1(nblk, st, rays, fetch_rows(st))

                st = jax.lax.fori_loop(0, k, inner, st)
                return (st, rays, orig_g)

            return body

        def cond(s):
            return jnp.any(s[0][5] == 0)

        # warmup rounds run unconditionally (a lax.cond would force carry
        # copies, the round-3 compaction lesson); on already-done state
        # nblk=1 elides all but one block so a wasted round is ~one
        # compaction permute
        carry = (st, rays, orig_g)
        for k in (4, 8):
            if k < sort_every:
                carry = rounds(k)(carry)

        # Multi-phase tail shrink: the while runs to the SLOWEST packet of
        # the chunk, and the XLA-level row gather pays per index for every
        # packet — done ones included (nblk only elides the Pallas
        # compute). Each time the active set fits a quarter of the current
        # width, compact and continue on the statically-sliced prefix: the
        # long lockstep tail (up to ~2x the median walk) then pays
        # shrinking-width gathers, permutes and dispatches. The sliced-off
        # suffixes are all done at each switch (actives sort to the
        # front), so their frozen state concatenates straight back.
        # Round-5 profile: the full-width fetch gather was ~213 ms/sample
        # at ~37-60% packet utilization; two phases measured -138 ms.
        shrink = int(os.environ.get("LUM_TRAV_SHRINK", "4"))
        sizes = []
        cur = (g // shrink) // GB * GB
        while GB <= cur < (sizes[-1] if sizes else g):
            sizes.append(cur)
            cur = (cur // shrink) // GB * GB
        st, rays, orig_g = carry
        done_suffixes = []
        for qg in sizes:
            def cond_gt(s, qg=qg):
                return jnp.sum((s[0][5] == 0).astype(jnp.int32)) > qg

            st, rays, orig_g = jax.lax.while_loop(
                cond_gt, rounds(sort_every), (st, rays, orig_g))
            st, rays, orig_g, _ = compact(st, rays, orig_g)
            done_suffixes.append((st[:, qg:], orig_g[qg:]))
            st, rays, orig_g = st[:, :qg], rays[:, :qg], orig_g[:qg]
        st, rays, orig_g = jax.lax.while_loop(
            cond, rounds(sort_every), (st, rays, orig_g))
        for s_, o_ in reversed(done_suffixes):
            st = jnp.concatenate([st, s_], axis=1)
            orig_g = jnp.concatenate([orig_g, o_])
        inv = jnp.argsort(orig_g)
        st = _permute_cols(st, inv)
    else:
        def cond(st):
            return jnp.any(st[5] == 0)

        def body(st):
            return run1(nblk0, st, rays, fetch_rows(st))

        st = jax.lax.while_loop(cond, body, st)

    t_best = jax.lax.bitcast_convert_type(
        st[_TB0:_TB0 + 16], jnp.float32)

    def from_pg(x):  # [PACKET, G] -> [N_in]
        return x.T.reshape(n)[:n_in]

    if any_hit:
        found_out = from_pg(st[24:40] != 0)
        z = jnp.zeros((n_in,), jnp.float32)
        return Hit(
            t=jnp.where(found_out, z, MISS_DIST),
            slot=jnp.where(found_out, 0, -1),
            u=z, v=z,
        )

    # Post-loop re-intersection of the winning leaf row (same as XLA path).
    from .intersect import ray_triangle
    leaf_out = from_pg(st[24:40])
    valid = leaf_out >= 0
    t_out = jnp.where(valid, from_pg(t_best), MISS_DIST)
    rowT2 = rows[jnp.where(valid, leaf_out, m_nodes)].T   # [128, N]
    o1 = Vec3(origin.x[:n_in][None], origin.y[:n_in][None],
              origin.z[:n_in][None])
    d1 = Vec3(direction.x[:n_in][None], direction.y[:n_in][None],
              direction.z[:n_in][None])
    tv0 = Vec3(rowT2[0:14], rowT2[14:28], rowT2[28:42])
    te1 = Vec3(rowT2[42:56], rowT2[56:70], rowT2[70:84])
    te2 = Vec3(rowT2[84:98], rowT2[98:112], rowT2[112:126])
    t2, u2, v2, hit2 = ray_triangle(o1, d1, tv0, te1, te2, t_min=t_min)
    t2 = jnp.where(hit2, t2, jnp.float32(np.inf))
    k = jnp.argmin(t2, axis=0).astype(jnp.int32)
    oh = jax.lax.broadcasted_iota(jnp.int32, (WIDE_LEAF, 1), 0) == k[None, :]
    u_out = jnp.sum(jnp.where(oh, u2, 0.0), axis=0)
    v_out = jnp.sum(jnp.where(oh, v2, 0.0), axis=0)
    slot_out = jnp.where(valid, (leaf_out - m_nodes) * WIDE_LEAF + k, -1)
    u_out = jnp.where(valid, u_out, 0.0)
    v_out = jnp.where(valid, v_out, 0.0)
    return Hit(t=t_out, slot=slot_out, u=u_out, v=v_out)
