"""Many-light sampling: emissive-triangle collection, alias-table selection,
NEE with MIS.

The reference builds an 8-wide quantized light tree (Estevez-Kulla) with
stochastic traversal + RIS reservoirs (reference: src/luminary/device/
device_light.c, cuda/light_tree.cuh, light.cuh:27-60). The TPU build starts
from the other end: a power-weighted **alias table** gives O(1), fully
vectorized light selection with zero pointer chasing — ideal for the VPU —
and RIS over K alias-drawn candidates recovers spatial importance (distance/
orientation) that the tree would provide. The tree remains the planned
upgrade for scenes with 10k+ lights where power-only selection wastes
candidates.

Device arrays live in leaf-slot space: a hit's slot id maps directly to its
NEE selection pdf for MIS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .random import RandomTarget, random_1d, random_2d
from .rowops import gather_planar, planar
from .vec import Vec3, gather as vgather


@jax.tree_util.register_pytree_node_class
class DeviceLights:
    """Packed light set: alias table + (for many-light scenes) the 16-wide
    light tree (ops/light_tree.py). tree_num_nodes/tree_levels are STATIC
    aux data: the stochastic descent unrolls `levels + 1` steps under jit.

    Array fields:
      prob/alias/slot/select_pdf: alias table over L emissive triangles.
        (Production alias draws read the FUSED light_slot_rows table,
        render/device_scene.py LSR_ALIAS_*; these dense [L] tables serve
        small scenes, MIS pdf lookups, and the packers.)
      slot_select_pdf/slot_area [P]: per-slot MIS data for BSDF-sampled hits.
      tree_rows: unified light-tree table (dummy [1, 128] when absent).
    """

    def __init__(self, prob, alias, slot, select_pdf,
                 slot_select_pdf, slot_area, num_lights, total_power,
                 tree_rows, micro_rows=None, tree_num_nodes: int = 0,
                 tree_levels: int = 0, has_micro: bool = False):
        self.prob = prob
        self.alias = alias
        self.slot = slot
        self.select_pdf = select_pdf
        self.slot_select_pdf = slot_select_pdf
        self.slot_area = slot_area
        self.num_lights = num_lights
        self.total_power = total_power
        self.tree_rows = tree_rows
        # micro_rows [L, 16]: per-light emission-texture cell weights for
        # microtriangle point importance (reference: light_microtriangle.cuh
        # 64-microtriangle emission sampling — here 16 equal-area cells of
        # the sqrt-warp domain). Dummy [1, 16] when has_micro is False.
        self.micro_rows = (micro_rows if micro_rows is not None
                           else np.ones((1, 16), np.float32))
        self.tree_num_nodes = tree_num_nodes
        self.tree_levels = tree_levels
        self.has_micro = has_micro

    @property
    def has_tree(self) -> bool:
        return self.tree_levels > 0

    def tree_flatten(self):
        return (
            (self.prob, self.alias, self.slot, self.select_pdf,
             self.slot_select_pdf, self.slot_area,
             self.num_lights, self.total_power, self.tree_rows,
             self.micro_rows),
            (self.tree_num_nodes, self.tree_levels, self.has_micro),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves[:9], micro_rows=leaves[9], tree_num_nodes=aux[0],
                   tree_levels=aux[1], has_micro=aux[2])


def build_alias_table(weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vose's O(L) alias method (host-side, numpy)."""
    l = len(weights)
    prob = np.zeros(l, np.float32)
    alias = np.zeros(l, np.int32)
    w = weights * l / max(weights.sum(), 1e-20)
    small = [i for i in range(l) if w[i] < 1.0]
    large = [i for i in range(l) if w[i] >= 1.0]
    while small and large:
        s, g = small.pop(), large.pop()
        prob[s] = w[s]
        alias[s] = g
        w[g] = w[g] + w[s] - 1.0
        (small if w[g] < 1.0 else large).append(g)
    for g in large:
        prob[g] = 1.0
    for s in small:
        prob[s] = 1.0
    return prob, alias


def pack_lights(
    tri_v0: np.ndarray,
    tri_e1: np.ndarray,
    tri_e2: np.ndarray,
    material_id: np.ndarray,
    emission: np.ndarray,  # [M,3] per-material pre-scaled emission
    emissive_flags: np.ndarray,  # [M] bool
    valid_slot: np.ndarray,  # [P] bool (not padding)
    tex_lum_mean: np.ndarray | None = None,  # [P] luminance-map triangle mean
    micro_w: np.ndarray | None = None,  # [P, 16] luminance-map cell weights
) -> DeviceLights:
    """Collect emissive triangles (reference: device_light.c light-fragment
    caching). tex_lum_mean carries the per-triangle mean of the material's
    luminance map (the reference's GPU texture-emission integrator,
    device_light.c:1952-2018) into the selection importance — alias table
    AND light tree; the estimator itself applies the true texel at the
    sampled point, so this only reshapes variance."""
    p = tri_v0.shape[0]
    mat = material_id.astype(np.int64)
    is_light = valid_slot & emissive_flags[mat]
    slots = np.nonzero(is_light)[0].astype(np.int32)

    area = 0.5 * np.linalg.norm(
        np.cross(tri_e1, tri_e2), axis=-1
    ).astype(np.float32)
    lum = (
        0.2126 * emission[mat, 0] + 0.7152 * emission[mat, 1] + 0.0722 * emission[mat, 2]
    ).astype(np.float32)
    power = area * lum * np.pi  # one-sided diffuse emitter power
    if tex_lum_mean is not None:
        power = power * tex_lum_mean.astype(np.float32)

    slot_select_pdf = np.zeros(p, np.float32)
    if len(slots):
        w = power[slots]
        keep = w > 0.0  # zero-power "emitters" would break tree importance
        slots = slots[keep]
    if len(slots):
        w = power[slots]
        total = float(w.sum())
        sel = (w / max(total, 1e-20)).astype(np.float32)
        prob, alias = build_alias_table(w.astype(np.float64))
        slot_select_pdf[slots] = sel

        from .light_tree import LIGHT_TREE_MIN_LIGHTS, build_light_tree

        tree_rows = np.zeros((1, 128), np.float32)
        tree_nodes = tree_levels = 0
        if len(slots) >= LIGHT_TREE_MIN_LIGHTS:
            v0s, e1s, e2s = tri_v0[slots], tri_e1[slots], tri_e2[slots]
            # leaves store the DENSE light index (0..L-1) — the real slot
            # id rides the compact candidate row (light_slot_rows) instead
            tree = build_light_tree(
                centroid=(v0s + (e1s + e2s) / 3.0).astype(np.float32),
                corners=np.stack(
                    [v0s, v0s + e1s, v0s + e2s], axis=1
                ).astype(np.float32),
                power=w.astype(np.float32),
                slots=np.arange(len(slots), dtype=np.int32),
            )
            tree_rows = tree.rows
            tree_nodes, tree_levels = tree.num_nodes, tree.levels
        micro_rows = None
        has_micro = False
        if micro_w is not None:
            micro_rows = micro_w[slots].astype(np.float32)  # [L, 16]
            # only enable when some light's map actually varies — a uniform
            # map reduces to uniform point sampling at pure extra cost
            spread = micro_rows.max(axis=1) - micro_rows.min(axis=1)
            has_micro = bool((spread > 1e-3 * micro_rows.max(axis=1)).any())
            if not has_micro:
                micro_rows = None
        return DeviceLights(
            prob=prob,
            alias=alias,
            slot=slots,
            select_pdf=sel,
            slot_select_pdf=slot_select_pdf,
            slot_area=area,
            num_lights=np.int32(len(slots)),
            total_power=np.float32(total),
            tree_rows=tree_rows,
            micro_rows=micro_rows,
            tree_num_nodes=tree_nodes,
            tree_levels=tree_levels,
            has_micro=has_micro,
        )
    return DeviceLights(
        prob=np.ones((1,), np.float32),
        alias=np.zeros((1,), np.int32),
        slot=np.zeros((1,), np.int32),
        select_pdf=np.zeros((1,), np.float32),
        slot_select_pdf=slot_select_pdf,
        slot_area=area,
        num_lights=np.int32(0),
        total_power=np.float32(0.0),
        tree_rows=np.zeros((1, 128), np.float32),
    )


def sample_light_point(
    lights: DeviceLights,
    shade_rows,
    pixel_id,
    sample_id,
    depth,
    geo=None,
    materials=None,
    slot=None,
    pdf_select=None,
    sel_valid=None,
    bn=None,
):
    """Draw one light triangle + a uniform point on it.

    Selection comes from the alias table by default, or from a caller-drawn
    candidate (`slot`/`pdf_select`/`sel_valid` — e.g. a light-tree descent,
    ops/light_tree.py) — in DENSE light-index space (0..L-1), never slot
    space. Returns (light_slot [N] — the REAL leaf-slot id, point Vec3,
    normal Vec3, pdf_area [N], pdf_area_alias [N], emission (r, g, b) [N]
    arrays, emission_valid [N], (b1, b2)). pdf_area is over the light
    surface: select_pdf/area with the TRUE candidate pdf (the RIS
    resampling weight); pdf_area_alias always uses the light's alias-table
    pdf — the nominal MIS pdf shared with the BSDF-hit side, whichever
    process drew the light. Everything per-light comes from ONE slim
    candidate-row gather (`shade_rows` here is the COMPACT FUSED [L, 37]
    (or [L, 69] with micro weights) light_slot_rows table — LSR_* column
    map, render/device_scene.py; compact so the gather source stays
    VMEM-resident, fused so an alias draw needs no second gather).
    """
    from ..render.device_scene import (
        LSR_ALIAS_PROB,
        LSR_ALIAS_ROW,
        LSR_AREA,
        LSR_COLS,
        LSR_E1,
        LSR_E2,
        LSR_EMISSION,
        LSR_FACE_N,
        LSR_FUSED_COLS,
        LSR_FUSED_MICRO_COLS,
        LSR_MICRO_ALIAS,
        LSR_MICRO_OWN,
        LSR_SELECT_PDF,
        LSR_SLOT,
        LSR_V0,
    )

    row = None          # the candidate's 18-col LSR block, when already fetched
    mrow_fused = None   # the candidate's raw micro weights, when already fetched
    light_ix = None
    # The fused path requires the table shape pack_light_slot_rows builds
    # for THIS light set (69 cols with micro weights, 37 without): both are
    # rebuilt under the same dirty flags, so a mismatch means a compact
    # 18-col table (the very-large-L fallback) and takes the gather path
    # below instead.
    fused_cols = (LSR_FUSED_MICRO_COLS if lights.has_micro
                  else LSR_FUSED_COLS)
    if slot is None:
        l = lights.prob.shape[0]
        r = random_2d(RandomTarget.LIGHT_TREE, pixel_id, sample_id, depth,
                      bn=bn)
        idx = jnp.minimum((r[..., 0] * l).astype(jnp.int32), l - 1)
        if shade_rows is not None and shade_rows.shape[1] >= fused_cols:
            # big-scene path: ONE fused row gather serves the whole alias
            # candidate — acceptance prob, both possible 18-col blocks, and
            # (when present) both micro-weight blocks ride the same row, so
            # the redirect and the candidate fetch are a per-column select
            # instead of a second dependent gather (tools/nee_probe.py
            # measured the two dependent gathers as ~all of the
            # ~5 ms/candidate cost).
            # planar [fused_cols, N] (ops/rowops.py): the alias select and
            # the ~10 column consumers below then read flat component rows
            # instead of re-streaming 128-lane-padded [N, C] tiles
            rf = gather_planar(shade_rows, idx)
            take_alias = (r[..., 1] >= rf[LSR_ALIAS_PROB])[None, :]
            row = jnp.where(
                take_alias, rf[LSR_ALIAS_ROW:LSR_ALIAS_ROW + LSR_COLS],
                rf[0:LSR_COLS])                      # [18, N] planar
            pdf_select = row[LSR_SELECT_PDF]
            if lights.has_micro:
                mrow_fused = jnp.where(
                    take_alias,
                    rf[LSR_MICRO_ALIAS:LSR_MICRO_ALIAS + 16],
                    rf[LSR_MICRO_OWN:LSR_MICRO_OWN + 16])  # [16, N]
        else:
            # small-table path: XLA lowers these gathers to cheap selects
            take_alias = r[..., 1] >= lights.prob[idx]
            light_ix = jnp.where(take_alias, lights.alias[idx], idx)
            pdf_select = lights.select_pdf[light_ix]
    else:
        light_ix = jnp.maximum(slot, 0)  # invalid lanes masked via sel_valid

    # Point on the triangle: uniform sqrt warp, optionally importance-
    # warped into one of 16 equal-area cells of the warp domain by the
    # light's emission-texture cell weights (reference:
    # light_microtriangle.cuh 64-microtriangle emission sampling; consumes
    # RandomTarget.MICROTRIANGLE). The TRUE point pdf gains the cell factor
    # (RIS weight / estimator); the alias-nominal MIS pdf stays area-uniform
    # on both strategies, so MIS weights still sum to 1.
    r2 = random_2d(RandomTarget.LIGHT_TRIANGLE, pixel_id, sample_id, depth,
                   bn=bn)
    r1u, r2u = r2[..., 0], r2[..., 1]
    micro_factor = None
    if lights.has_micro:
        # invariant: the fused branch (light_ix None) always sets mrow_fused
        # when has_micro — its >= fused_cols guard demands the 69-col table
        # precisely so the micro blocks ride the same gather. A 37-col table
        # with has_micro lights takes the small-table path (light_ix set).
        assert mrow_fused is not None or light_ix is not None
        mrow = (mrow_fused if mrow_fused is not None
                else planar(
                    lights.micro_rows[jnp.maximum(light_ix, 0)]))  # [16, N]
        mr = random_1d(RandomTarget.MICROTRIANGLE, pixel_id, sample_id,
                       depth, bn=bn)
        cum = jnp.cumsum(mrow, axis=0)
        tot = cum[-1]
        pick = jnp.minimum(
            jnp.sum((cum <= (mr * tot)[None, :]).astype(jnp.int32), axis=0),
            15)
        oh = jnp.arange(16, dtype=jnp.int32)[:, None] == pick[None, :]
        w_c = jnp.sum(jnp.where(oh, mrow, 0.0), axis=0)
        ok_m = tot > 0.0
        p_cell = jnp.where(ok_m, w_c / jnp.maximum(tot, 1e-30), 1.0)
        ci = (pick // 4).astype(jnp.float32)
        cj = (pick % 4).astype(jnp.float32)
        r1u = jnp.where(ok_m, (ci + r1u) * 0.25, r1u)
        r2u = jnp.where(ok_m, (cj + r2u) * 0.25, r2u)
        micro_factor = jnp.where(ok_m & (p_cell > 0.0), p_cell * 16.0, 1.0)
    su = jnp.sqrt(jnp.clip(r1u, 1e-8, 1.0))
    b1 = 1.0 - su
    b2 = r2u * su
    if shade_rows is not None:
        if row is None:  # tree-candidate path: fetch the block by dense id
            row = gather_planar(shade_rows, light_ix)  # [C, N] planar
        slot = jax.lax.bitcast_convert_type(row[LSR_SLOT], jnp.int32)
        v0 = Vec3(row[LSR_V0], row[LSR_V0 + 1], row[LSR_V0 + 2])
        e1 = Vec3(row[LSR_E1], row[LSR_E1 + 1], row[LSR_E1 + 2])
        e2 = Vec3(row[LSR_E2], row[LSR_E2 + 1], row[LSR_E2 + 2])
        n = Vec3(row[LSR_FACE_N], row[LSR_FACE_N + 1],
                 row[LSR_FACE_N + 2])
        emission = (row[LSR_EMISSION], row[LSR_EMISSION + 1],
                    row[LSR_EMISSION + 2])
        area = row[LSR_AREA]
        alias_select = row[LSR_SELECT_PDF]
    else:
        # small-table path: XLA lowers these gathers to cheap selects
        slot = lights.slot[light_ix]
        v0 = vgather(geo.bvh.tri_v0, slot)
        e1 = vgather(geo.bvh.tri_e1, slot)
        e2 = vgather(geo.bvh.tri_e2, slot)
        n = vgather(geo.face_normal, slot)
        l_mat = geo.material_id[slot]
        emission = (materials.emission_r[l_mat], materials.emission_g[l_mat],
                    materials.emission_b[l_mat])
        area = lights.slot_area[slot]
        alias_select = lights.slot_select_pdf[slot]
    point = v0 + e1 * b1 + e2 * b2
    pdf_area = pdf_select / jnp.maximum(area, 1e-12)
    pdf_area_alias = alias_select / jnp.maximum(area, 1e-12)
    if micro_factor is not None:
        # the micro factor enters BOTH the true pdf (estimator/RIS) and the
        # alias-nominal MIS pdf — the hit side evaluates the same factor
        # from its shade row (SHADE_MICRO cols), keeping the two strategies'
        # nominal pdfs one function of the point (weights sum to 1)
        pdf_area = pdf_area * micro_factor
        pdf_area_alias = pdf_area_alias * micro_factor
    ok = lights.num_lights > 0
    ok = (ok & sel_valid) if sel_valid is not None else (ok & (pdf_select > 0.0))
    return slot, point, n, pdf_area, pdf_area_alias, emission, ok, (b1, b2)


def light_pdf_solid_angle(lights: DeviceLights, hit_slot, hit_t, cos_light):
    """pdf (solid angle) that NEE would have produced this BSDF-sampled hit —
    the MIS counterpart weight."""
    sel = lights.slot_select_pdf[hit_slot]
    area = lights.slot_area[hit_slot]
    pdf_area = sel / jnp.maximum(area, 1e-12)
    return pdf_area * hit_t * hit_t / jnp.maximum(jnp.abs(cos_light), 1e-8)


def light_pdf_from_row(sel_pdf, area, hit_t, cos_light):
    """light_pdf_solid_angle when sel_pdf/area already sit in a gathered
    shade row (no extra per-slot gathers)."""
    pdf_area = sel_pdf / jnp.maximum(area, 1e-12)
    return pdf_area * hit_t * hit_t / jnp.maximum(jnp.abs(cos_light), 1e-8)


def mis_balance(pdf_a, pdf_b):
    """Balance heuristic weight for strategy a."""
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-20)
