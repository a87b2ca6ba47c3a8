"""Many-light hierarchy: host-built 16-wide light tree + stochastic descent.

TPU re-design of the reference's Estevez-Kulla light tree (reference:
src/luminary/device/device_light.c:270,1155 — binary SAH over light
fragments collapsed to 8-wide quantized nodes; traversal
cuda/light_tree.cuh:10-33). Differences, by design:

  * Same unified-table discipline as the geometry BVH (bvh/wide.py): node
    rows and leaf rows share one [M+B, 128] table so every descent level is
    exactly ONE row gather per lane.
  * The descent draws ONE light per call (product of stochastic branch
    probabilities = selection pdf); K RIS candidates = K descents. The
    reference instead extracts up to 8 candidates per traversal with a
    continuation stack — on TPU, per-index gather cost makes K independent
    shallow descents the same price and much simpler.
  * No quantization yet (f32 rows); nodes carry (center, radius, power),
    importance = power / max(d^2, r^2) — the Kulla distance-clamped form
    without orientation cones. The RIS target re-weights candidates by the
    true BSDF-weighted contribution afterwards, which recovers most of what
    cones would add.
  * MIS against BSDF sampling keeps the power-only alias pdf as the nominal
    NEE pdf on both sides (see render/wavefront.py RIS note): the tree then
    only shapes candidate *quality*, never bias.

Node row [128]: cols 0:16 child center x | 16:32 y | 32:48 z | 48:64 radius
| 64:80 subtree power | 80:96 child code (bitcast i32; >=0 node, <0 leaf
block = ~code, INVALID absent) | 96:112 cone axis (octahedral uv packed as
2xf16 in one f32) | 112:128 cos of the cone half-angle (orientation bound
θ_o; reference device_light.c cone importance terms) | nothing free.
Leaf row [128]: 14 lights: 0:14 slot (bitcast i32, -1 pad) | 14:28 power |
28:42 centroid x | 42:56 y | 56:70 z | 70:84 face normal (oct 2xf16)
| 84:128 zero.

Orientation importance: emitters are one-sided, so a cluster whose cone
faces away from the shading point is down-weighted by
max(cos(max(θ − θ_o, 0)), CONE_EPS) where θ is the angle between the cone
axis and (x − center). The CONE_EPS floor keeps every contributing light's
selection pdf positive (bias-free — cones shape candidate QUALITY only).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bvh.builder import build_bvh
from ..bvh.wide import _collapse_children
from .random import RandomTarget, random_1d
from .rowops import gather_planar
from .vec import Vec3

INVALID = np.int32(0x7FFFFFFF)
TREE_LEAF = 14
BRANCH = 16
# Below this many lights the alias table alone is fine (selection quality
# barely matters; RIS does the spatial work).
LIGHT_TREE_MIN_LIGHTS = 64
# Orientation-importance floor: back-facing clusters keep this fraction of
# their distance-power importance so every light's pdf stays positive.
CONE_EPS = 0.01


def _oct_encode_np(n: np.ndarray) -> np.ndarray:
    """Unit vectors [K, 3] → octahedral uv in [-1, 1]² (numpy)."""
    a = np.abs(n).sum(axis=-1, keepdims=True)
    v = n / np.maximum(a, 1e-12)
    uv = v[..., [0, 2]].copy()
    neg = v[..., 1] < 0.0
    flip = (1.0 - np.abs(uv[..., ::-1])) * np.where(uv >= 0.0, 1.0, -1.0)
    uv[neg] = flip[neg]
    return uv


def _pack_oct_f16(uv: np.ndarray) -> np.ndarray:
    """oct uv [K, 2] → one f32 per vector carrying two f16 halves."""
    h = uv.astype(np.float16).view(np.uint16).astype(np.uint32)
    packed = h[..., 0] | (h[..., 1] << 16)
    return packed.view(np.float32)


def _unpack_oct_f16(col):
    """jnp inverse of _pack_oct_f16 → unit direction Vec3 components."""
    bits = jax.lax.bitcast_convert_type(col, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        (bits & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (bits >> 16).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    u, v = lo, hi
    y = 1.0 - jnp.abs(u) - jnp.abs(v)
    neg = y < 0.0
    sx = jnp.where(u >= 0.0, 1.0, -1.0)
    sz = jnp.where(v >= 0.0, 1.0, -1.0)
    x = jnp.where(neg, (1.0 - jnp.abs(v)) * sx, u)
    z = jnp.where(neg, (1.0 - jnp.abs(u)) * sz, v)
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-12))
    return x * inv, y * inv, z * inv


class LightTree(NamedTuple):
    rows: np.ndarray  # f32 [M+B, 128]
    num_nodes: int  # static
    levels: int  # static: max node depth (descent unrolls levels+1 steps)


def build_light_tree(
    centroid: np.ndarray,  # [L, 3] light centroids
    corners: np.ndarray,  # [L, 3, 3] triangle corners (for SAH bounds)
    power: np.ndarray,  # [L] emitted power (> 0)
    slots: np.ndarray,  # [L] leaf-slot id of each light
) -> LightTree:
    """SAH build (reuses the geometry BVH2 builder over light bounds) +
    16-wide collapse with per-subtree power + orientation-cone
    aggregation (reference: device_light.c cone importance terms)."""
    bvh2 = build_bvh(corners, leaf_size=TREE_LEAF)

    # per-light one-sided emission normals
    e1 = corners[:, 1] - corners[:, 0]
    e2 = corners[:, 2] - corners[:, 0]
    nrm = np.cross(e1, e2)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)

    # --- subtree power + cones, bottom-up over the BVH2 ---
    n_blocks = bvh2.num_blocks

    def block_lights(b: int) -> np.ndarray:
        ids = bvh2.tri_order[b * TREE_LEAF : (b + 1) * TREE_LEAF]
        return ids[ids >= 0]

    def cone_union(axes, thetas, weights):
        """Conservative union of K cones: power-weighted mean axis; half
        angle covering every member cone."""
        w = np.maximum(np.asarray(weights, np.float64), 1e-12)
        axis = (np.asarray(axes) * w[:, None]).sum(axis=0)
        ln = np.linalg.norm(axis)
        if ln < 1e-9:
            return np.array([0.0, 1.0, 0.0]), np.pi
        axis = axis / ln
        ang = np.arccos(np.clip(np.asarray(axes) @ axis, -1.0, 1.0))
        theta = float(np.minimum(np.max(ang + np.asarray(thetas)), np.pi))
        return axis, theta

    block_power = np.zeros(n_blocks, np.float64)
    block_axis = np.zeros((n_blocks, 3), np.float64)
    block_theta = np.zeros(n_blocks, np.float64)
    for b in range(n_blocks):
        ids = block_lights(b)
        block_power[b] = power[ids].sum()
        if len(ids):
            block_axis[b], block_theta[b] = cone_union(
                nrm[ids], np.zeros(len(ids)), power[ids])
        else:
            block_axis[b] = (0.0, 1.0, 0.0)
            block_theta[b] = np.pi

    node_power = np.zeros(bvh2.num_nodes, np.float64)
    node_axis = np.zeros((bvh2.num_nodes, 3), np.float64)
    node_theta = np.zeros(bvh2.num_nodes, np.float64)
    node_done = np.zeros(bvh2.num_nodes, bool)

    def subtree_cone(code: int):
        """(power, axis, theta) of a subtree, memoized."""
        if code == int(INVALID):
            return 0.0, np.array([0.0, 1.0, 0.0]), 0.0
        if code < 0:
            b = ~code
            return float(block_power[b]), block_axis[b], float(block_theta[b])
        if not node_done[code]:
            p0, a0, t0 = subtree_cone(int(bvh2.child[code, 0]))
            p1, a1, t1 = subtree_cone(int(bvh2.child[code, 1]))
            node_power[code] = p0 + p1
            node_axis[code], node_theta[code] = cone_union(
                [a0, a1], [t0, t1], [p0, p1])
            node_done[code] = True
        return (float(node_power[code]), node_axis[code],
                float(node_theta[code]))

    def subtree_power(code: int) -> float:
        return subtree_cone(code)[0]

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100000))
    try:
        subtree_cone(0)
    finally:
        sys.setrecursionlimit(old)

    # --- 16-wide collapse (same shape as bvh/wide.collapse_wide) ---
    node_rows: list[np.ndarray] = []
    leaf_rows: list[np.ndarray] = []
    pending = [(0, 0)]
    node_rows.append(np.zeros(128, np.float32))
    depth_of = {0: 1}
    max_depth = 1

    def emit_leaf(code2: int) -> int:
        ids = block_lights(~code2)
        row = np.zeros(128, np.float32)
        srow = np.full(TREE_LEAF, -1, np.int32)
        srow[: len(ids)] = slots[ids]
        row[0:14] = srow.view(np.float32)
        row[14 : 14 + len(ids)] = power[ids]
        row[28 : 28 + len(ids)] = centroid[ids, 0]
        row[42 : 42 + len(ids)] = centroid[ids, 1]
        row[56 : 56 + len(ids)] = centroid[ids, 2]
        if len(ids):
            row[70 : 70 + len(ids)] = _pack_oct_f16(_oct_encode_np(nrm[ids]))
        leaf_rows.append(row)
        return ~(len(leaf_rows) - 1)

    while pending:
        wide_id, node2 = pending.pop()
        entries = _collapse_children(bvh2, node2)
        row = np.zeros(128, np.float32)
        codes = np.full(BRANCH, INVALID, np.int32)
        for k, (code, lo, hi) in enumerate(entries):
            c = 0.5 * (lo + hi)
            row[0 * 16 + k] = c[0]
            row[1 * 16 + k] = c[1]
            row[2 * 16 + k] = c[2]
            row[3 * 16 + k] = 0.5 * float(np.linalg.norm(hi - lo))
            _, c_axis, c_theta = subtree_cone(int(code))
            row[6 * 16 + k] = float(_pack_oct_f16(
                _oct_encode_np(np.asarray([c_axis])))[0])
            row[7 * 16 + k] = float(np.cos(min(c_theta, np.pi)))
            row[4 * 16 + k] = subtree_power(int(code))
            if code < 0:
                codes[k] = emit_leaf(int(code))
            else:
                child_wide = len(node_rows)
                node_rows.append(np.zeros(128, np.float32))
                pending.append((child_wide, int(code)))
                codes[k] = child_wide
                depth_of[child_wide] = depth_of[wide_id] + 1
                max_depth = max(max_depth, depth_of[child_wide])
        row[5 * 16 : 6 * 16] = codes.view(np.float32)
        node_rows[wide_id] = row

    if not leaf_rows:  # degenerate: no lights
        leaf_rows.append(np.zeros(128, np.float32))
        empty = np.full(TREE_LEAF, -1, np.int32)
        leaf_rows[0][0:14] = empty.view(np.float32)

    rows = np.concatenate(
        [np.stack(node_rows), np.stack(leaf_rows)], axis=0
    ).astype(np.float32)
    return LightTree(rows=rows, num_nodes=len(node_rows), levels=max_depth)


def sample_light_tree(
    tree_rows: jnp.ndarray,
    num_nodes: int,
    levels: int,
    pos: Vec3,
    pixel_id,
    sample_id,
    dk: int,
    chunk: int = 1 << 18,
    force: str | None = None,
    bn=None,
):
    """One stochastic descent per lane from the shading point `pos`.

    Returns (slot i32 [N], pdf_select f32 [N], valid bool [N]). pdf_select is
    the exact probability this descent selected that light (product of
    branch probabilities), usable directly as the RIS candidate pdf.

    Layout: all per-child math runs TRANSPOSED [16, n] / [14, n] — [n, 16]
    would pad its minor axis 16 → 128 (9x memory blowup, measured OOM at 2M
    lanes). Big wavefronts run in lax.map chunks to bound the transposed
    row buffer ([128, chunk]).

    `force` = "xla" | "pallas" selects the level-body implementation; the
    default picks the fused Pallas body (ops/light_tree_pallas.py) on TPU
    backends. Round 3 measured that kernel 0.75x because its augmented
    176-col gather + XLA transpose cost more than the fused math saved;
    round 5's split (gather_planar 128-col rows + XLA-side f16 decode)
    removed both overheads and the fused body now wins — the XLA body's
    ~10 slice/reduce fusions per level each re-stream the [16, m]
    intermediates.
    """
    from .traverse import _use_pallas

    n = pos.x.shape[0]
    pixel_id = jnp.broadcast_to(jnp.asarray(pixel_id, jnp.uint32), (n,))
    sample_id = jnp.broadcast_to(jnp.asarray(sample_id, jnp.uint32), (n,))

    use_pallas = (force == "pallas"
                  or (force is None and _use_pallas()))
    if use_pallas:
        from .light_tree_pallas import descend_pallas

        interpret = not _use_pallas()
        nbn = len(bn) if bn is not None else 0

        def run(args):
            px, py, pz, pid, sid, *bnc = args
            return descend_pallas(
                tree_rows, num_nodes, levels, Vec3(px, py, pz),
                pid, sid, dk, interpret=interpret,
                bn=tuple(bnc) if nbn else None)

        args = (pos.x, pos.y, pos.z, pixel_id, sample_id) + (
            tuple(bn) if bn is not None else ())
        if n <= chunk:
            return run(args)
        pad = (-n) % chunk
        if pad:
            args = jax.tree_util.tree_map(
                lambda x: jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]),
                args)
        reshaped = jax.tree_util.tree_map(
            lambda x: x.reshape(-1, chunk), args)
        out = jax.lax.map(run, reshaped)
        return jax.tree_util.tree_map(lambda x: x.reshape(-1)[:n], out)

    def run(args):
        px, py, pz, pid, sid, *bnc = args
        bnl = tuple(bnc) if bnc else None
        m = px.shape[0]
        node = jnp.zeros((m,), jnp.int32)
        pdf = jnp.ones((m,), jnp.float32)
        slot = jnp.full((m,), -1, jnp.int32)
        at_leaf = jnp.zeros((m,), bool)
        done = jnp.zeros((m,), bool)
        kid16 = jnp.arange(BRANCH, dtype=jnp.int32)[:, None]
        kid14 = jnp.arange(TREE_LEAF, dtype=jnp.int32)[:, None]

        for lvl in range(levels + 1):
            if lvl == 0:
                # every lane starts at the root — broadcast, not gather
                rowT = jnp.broadcast_to(tree_rows[0][:, None], (128, m))
            else:
                # THE gather, handed out planar [128, m] via the Pallas
                # block transpose (ops/rowops.py — an XLA .T on the padded
                # row array costs ~10 consumer passes)
                rowT = gather_planar(tree_rows, node)
            r = random_1d(
                RandomTarget.LIGHT_TREE_LEVEL, pid, sid, dk * 8 + lvl, bn=bnl
            )

            # --- node interpretation: child by clamped-distance power ×
            # orientation-cone factor (reference device_light.c cones) ---
            dx = rowT[0:16] - px[None]
            dy = rowT[16:32] - py[None]
            dz = rowT[32:48] - pz[None]
            rad = rowT[48:64]
            pw = rowT[64:80]
            code16 = jax.lax.bitcast_convert_type(rowT[80:96], jnp.int32)
            d2 = dx * dx + dy * dy + dz * dz
            imp = pw / jnp.maximum(d2, jnp.maximum(rad * rad, 1e-8))
            # cone factor: cos(max(θ − θ_o − θ_u, 0)) with θ the angle from
            # the cone axis to (x − center), θ_u the cluster's subtended
            # half-angle (sin θ_u = r/d); floored at CONE_EPS so every
            # contributing light keeps a positive pdf
            ax, ay, az = _unpack_oct_f16(rowT[96:112])
            inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
            cos_t = -(ax * dx + ay * dy + az * dz) * inv_d
            cos_t = jnp.clip(cos_t, -1.0, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
            cos_o = jnp.clip(rowT[112:128], -1.0, 1.0)
            sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))
            c1 = jnp.where(cos_t >= cos_o, 1.0,
                           cos_t * cos_o + sin_t * sin_o)
            s1 = jnp.sqrt(jnp.maximum(1.0 - c1 * c1, 0.0))
            sin_u = jnp.minimum(rad * inv_d, 1.0)
            cos_u = jnp.sqrt(jnp.maximum(1.0 - sin_u * sin_u, 0.0))
            c2 = jnp.where(c1 >= cos_u, 1.0, c1 * cos_u + s1 * sin_u)
            imp = imp * jnp.maximum(c2, CONE_EPS)
            imp = jnp.where(code16 == INVALID, 0.0, imp)  # [16, m]
            tot = jnp.sum(imp, axis=0)
            cum = jnp.cumsum(imp, axis=0)
            rt = r * tot
            pick = jnp.minimum(
                jnp.sum((cum <= rt[None]).astype(jnp.int32), axis=0),
                BRANCH - 1,
            )
            oh = kid16 == pick[None]
            p_c = jnp.sum(jnp.where(oh, imp, 0.0), axis=0) / jnp.maximum(
                tot, 1e-30
            )
            c_sel = jnp.sum(jnp.where(oh, code16, 0), axis=0)

            # --- leaf interpretation: light by power / distance² × the
            # exact one-sided emission facing factor (statically skipped at
            # level 0: the root is always a node) ---
            if lvl == 0:
                ltot = jnp.zeros((m,), jnp.float32)
                p_l = jnp.zeros((m,), jnp.float32)
                s_sel = jnp.zeros((m,), jnp.int32)
            else:
                lslot = jax.lax.bitcast_convert_type(rowT[0:14], jnp.int32)
                lpw = rowT[14:28]
                ldx = rowT[28:42] - px[None]
                ldy = rowT[42:56] - py[None]
                ldz = rowT[56:70] - pz[None]
                ld2 = ldx * ldx + ldy * ldy + ldz * ldz
                lnx, lny, lnz = _unpack_oct_f16(rowT[70:84])
                l_inv_d = jax.lax.rsqrt(jnp.maximum(ld2, 1e-12))
                l_cos = -(lnx * ldx + lny * ldy + lnz * ldz) * l_inv_d
                l_face = jnp.maximum(l_cos, CONE_EPS)
                limp = jnp.where(
                    lslot >= 0, lpw * l_face / jnp.maximum(ld2, 1e-8), 0.0)
                ltot = jnp.sum(limp, axis=0)
                lcum = jnp.cumsum(limp, axis=0)
                lrt = r * ltot
                lpick = jnp.minimum(
                    jnp.sum((lcum <= lrt[None]).astype(jnp.int32), axis=0),
                    TREE_LEAF - 1,
                )
                loh = kid14 == lpick[None]
                p_l = jnp.sum(
                    jnp.where(loh, limp, 0.0), axis=0
                ) / jnp.maximum(ltot, 1e-30)
                s_sel = jnp.sum(jnp.where(loh, lslot, 0), axis=0)

            # --- merge the two interpretations ---
            step_node = ~done & ~at_leaf
            step_leaf = ~done & at_leaf
            ok_node = step_node & (tot > 0.0)
            ok_leaf = step_leaf & (ltot > 0.0)
            pdf = jnp.where(ok_node, pdf * p_c, pdf)
            pdf = jnp.where(ok_leaf, pdf * p_l, pdf)
            slot = jnp.where(ok_leaf, s_sel, slot)
            done = done | step_leaf | (step_node & ~ok_node)
            next_leaf = c_sel < 0
            node = jnp.where(
                ok_node,
                jnp.where(next_leaf, num_nodes + ~c_sel, c_sel),
                node,
            )
            at_leaf = jnp.where(ok_node, next_leaf, at_leaf)

        valid = (slot >= 0) & (pdf > 0.0)
        return slot, pdf, valid

    args = (pos.x, pos.y, pos.z, pixel_id, sample_id) + (
        tuple(bn) if bn is not None else ())
    if n <= chunk:
        return run(args)
    pad = (-n) % chunk
    if pad:
        args = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]), args
        )
    reshaped = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, chunk), args
    )
    out = jax.lax.map(run, reshaped)
    return jax.tree_util.tree_map(lambda x: x.reshape(-1)[:n], out)
