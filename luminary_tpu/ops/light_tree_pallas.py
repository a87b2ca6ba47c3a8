"""Pallas fused-body light-tree descent (the round-3 NEE performance kernel).

The XLA descent (ops/light_tree.py sample_light_tree) unrolls levels+1
steps; each step is ONE row gather plus ~100 vector ops on [16, m]
intermediates that XLA materializes to HBM between fusions — measured
~35 ms/level at 3.1M lanes, ~20x over the gather's bandwidth cost
(docs/PERF_NOTES.md). Same hybrid as the traversal kernel
(ops/traverse_pallas.py): the per-lane row gather stays at XLA level
(Mosaic cannot lower per-lane gathers), and ONE Pallas kernel per level
fuses the entire body — both node and leaf interpretation, cone/facing
importance, stochastic child selection — with the descent state flowing
through input_output_aliases.

Mosaic cannot bitcast-decode the packed f16 octahedral axes either
(16-bit conversions are unreliable), so the gather reads an AUGMENTED
[R, 176] table with the cone axes / leaf normals pre-decoded to f32
(built once per render call from the packed [R, 128] rows — R is a few
thousand, the decode is negligible):

  cols 0:128   the original unified node/leaf row (ops/light_tree.py)
  cols 128:176 node rows: cone axis x[16] y[16] z[16]
               leaf rows: normal x at 128:142, y at 144:158, z at 160:174

State (per lane, lanes-major [8, m]):
  sti i32: rows 0 node, 1 slot, 2 at_leaf, 3 done
  stf f32: row 0 pdf
Context (read-only [R_ctx, m]): rows 0:3 shading point xyz,
  row 3+lvl the level's uniform random.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vec import Vec3

import os as _os

BRANCH = 16
TREE_LEAF = 14
AUG_COLS = 176
# Lane-axis block per grid step. Descent lanes are INDIVIDUAL shading
# points (not 16-ray packets like the traversal), so the grid is 16x
# longer per wavefront — a larger block amortizes the per-block dispatch
# cost (measured: 512 → 4096 matters at 1M+ lanes). ~3 MB augT block.
GB = int(_os.environ.get("LUM_NEE_GB", "4096"))

_INVALID = np.int32(0x7FFFFFFF)
_CONE_EPS = np.float32(0.01)  # keep in sync with light_tree.CONE_EPS


def augment_tree_rows(rows: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """[R, 128] packed rows -> [R, 176] with decoded axes (jnp, tiny)."""
    from .light_tree import _unpack_oct_f16

    r = rows.shape[0]
    ax, ay, az = _unpack_oct_f16(rows[:, 96:112])  # node cone axes [R, 16]
    lx, ly, lz = _unpack_oct_f16(rows[:, 70:84])   # leaf normals  [R, 14]
    pad2 = jnp.zeros((r, 2), jnp.float32)
    node_aug = jnp.concatenate([ax, ay, az], axis=1)
    leaf_aug = jnp.concatenate([lx, pad2, ly, pad2, lz, pad2], axis=1)
    is_node = (jnp.arange(r) < num_nodes)[:, None]
    return jnp.concatenate(
        [rows, jnp.where(is_node, node_aug, leaf_aug)], axis=1)


def _cumsum_rows(x, span):
    """Prefix sum along the sublane axis via log-step shifted adds
    (Mosaic has no native cumsum)."""
    s = 1
    while s < span:
        x = x + jnp.concatenate(
            [jnp.zeros((s, x.shape[1]), x.dtype), x[:-s]], axis=0)
        s *= 2
    return x


def _make_level_kernel(num_nodes: int, lvl: int):
    inf = np.float32(np.inf)

    def kernel(ctx_ref, sti_ref, stf_ref, augT_ref, osti_ref, ostf_ref):
        osti_ref[:] = sti_ref[:]
        ostf_ref[:] = stf_ref[:]

        done = sti_ref[3:4] != 0          # [1, GB]
        at_leaf = sti_ref[2:3] != 0
        act = ~done
        any_node = jnp.any(act & ~at_leaf)
        any_leaf = jnp.any(act & at_leaf)

        px = ctx_ref[0:1]
        py = ctx_ref[1:2]
        pz = ctx_ref[2:3]
        r = ctx_ref[3 + lvl:4 + lvl]
        kid16 = jax.lax.broadcasted_iota(jnp.int32, (BRANCH, 1), 0)
        kid14 = jax.lax.broadcasted_iota(jnp.int32, (TREE_LEAF, 1), 0)

        @pl.when(any_node)
        def _node_section():
            aug = augT_ref
            dx = aug[0:16] - px           # [16, GB]
            dy = aug[16:32] - py
            dz = aug[32:48] - pz
            rad = aug[48:64]
            pw = aug[64:80]
            code16 = jax.lax.bitcast_convert_type(aug[80:96], jnp.int32)
            d2 = dx * dx + dy * dy + dz * dz
            imp = pw / jnp.maximum(d2, jnp.maximum(rad * rad, 1e-8))
            # orientation-cone factor (see light_tree.py for the math)
            ax = aug[128:144]
            ay = aug[144:160]
            az = aug[160:176]
            inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
            cos_t = -(ax * dx + ay * dy + az * dz) * inv_d
            cos_t = jnp.clip(cos_t, -1.0, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
            cos_o = jnp.clip(aug[112:128], -1.0, 1.0)
            sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))
            c1 = jnp.where(cos_t >= cos_o, 1.0,
                           cos_t * cos_o + sin_t * sin_o)
            s1 = jnp.sqrt(jnp.maximum(1.0 - c1 * c1, 0.0))
            sin_u = jnp.minimum(rad * inv_d, 1.0)
            cos_u = jnp.sqrt(jnp.maximum(1.0 - sin_u * sin_u, 0.0))
            c2 = jnp.where(c1 >= cos_u, 1.0, c1 * cos_u + s1 * sin_u)
            imp = imp * jnp.maximum(c2, _CONE_EPS)
            imp = jnp.where(code16 == _INVALID, 0.0, imp)
            tot = jnp.sum(imp, axis=0, keepdims=True)       # [1, GB]
            cum = _cumsum_rows(imp, BRANCH)
            rt = r * tot
            pick = jnp.minimum(
                jnp.sum((cum <= rt).astype(jnp.int32), axis=0,
                        keepdims=True), BRANCH - 1)
            oh = kid16 == pick
            p_c = (jnp.sum(jnp.where(oh, imp, 0.0), axis=0, keepdims=True)
                   / jnp.maximum(tot, 1e-30))
            c_sel = jnp.sum(jnp.where(oh, code16, 0), axis=0, keepdims=True)

            step_node = act & ~at_leaf
            ok_node = step_node & (tot > 0.0)
            next_leaf = c_sel < 0
            fetch_n = jnp.where(next_leaf, num_nodes + ~c_sel, c_sel)
            ostf_ref[0:1] = jnp.where(ok_node, stf_ref[0:1] * p_c,
                                      stf_ref[0:1])
            osti_ref[0:1] = jnp.where(ok_node, fetch_n, sti_ref[0:1])
            osti_ref[2:3] = jnp.where(
                ok_node, next_leaf.astype(jnp.int32), sti_ref[2:3])
            osti_ref[3:4] = jnp.where(
                step_node & ~ok_node, jnp.int32(1), sti_ref[3:4])

        @pl.when(any_leaf)
        def _leaf_section():
            aug = augT_ref
            lslot = jax.lax.bitcast_convert_type(aug[0:14], jnp.int32)
            lpw = aug[14:28]
            ldx = aug[28:42] - px
            ldy = aug[42:56] - py
            ldz = aug[56:70] - pz
            ld2 = ldx * ldx + ldy * ldy + ldz * ldz
            lnx = aug[128:142]
            lny = aug[144:158]
            lnz = aug[160:174]
            l_inv_d = jax.lax.rsqrt(jnp.maximum(ld2, 1e-12))
            l_cos = -(lnx * ldx + lny * ldy + lnz * ldz) * l_inv_d
            l_face = jnp.maximum(l_cos, _CONE_EPS)
            limp = jnp.where(lslot >= 0,
                             lpw * l_face / jnp.maximum(ld2, 1e-8), 0.0)
            ltot = jnp.sum(limp, axis=0, keepdims=True)
            lcum = _cumsum_rows(limp, TREE_LEAF)
            lrt = r * ltot
            lpick = jnp.minimum(
                jnp.sum((lcum <= lrt).astype(jnp.int32), axis=0,
                        keepdims=True), TREE_LEAF - 1)
            loh = kid14 == lpick
            p_l = (jnp.sum(jnp.where(loh, limp, 0.0), axis=0, keepdims=True)
                   / jnp.maximum(ltot, 1e-30))
            s_sel = jnp.sum(jnp.where(loh, lslot, 0), axis=0, keepdims=True)

            step_leaf = act & at_leaf
            ok_leaf = step_leaf & (ltot > 0.0)
            ostf_ref[0:1] = jnp.where(ok_leaf, stf_ref[0:1] * p_l,
                                      ostf_ref[0:1])
            osti_ref[1:2] = jnp.where(ok_leaf, s_sel, sti_ref[1:2])
            osti_ref[3:4] = jnp.where(
                step_leaf, jnp.int32(1), osti_ref[3:4])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_nodes", "lvl", "r_ctx", "interpret"),
)
def _run_level(ctx, sti, stf, augT, *, num_nodes, lvl, r_ctx, interpret):
    m = augT.shape[1]
    grid = m // GB
    kernel = _make_level_kernel(num_nodes, lvl)
    imap = lambda i: (0, i)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((r_ctx, GB), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, GB), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, GB), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((AUG_COLS, GB), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, GB), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, GB), imap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, m), jnp.int32),
            jax.ShapeDtypeStruct((8, m), jnp.float32),
        ],
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(ctx, sti, stf, augT)


def descend_pallas(tree_rows, num_nodes: int, levels: int, pos: Vec3,
                   pixel_id, sample_id, dk: int, interpret: bool = False):
    """Fused-body equivalent of one sample_light_tree descent chunk.

    Same state machine and numerics as the XLA path (identical slot picks
    given identical randoms). Returns (slot i32 [n], pdf f32 [n],
    valid bool [n])."""
    from .random import RandomTarget, random_1d

    n = pos.x.shape[0]
    pad = (-n) % GB
    aug = augment_tree_rows(tree_rows, num_nodes)

    def padv(x, fill=0):
        return (jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
                if pad else x)

    px, py, pz = padv(pos.x), padv(pos.y), padv(pos.z)
    pid = padv(jnp.broadcast_to(jnp.asarray(pixel_id, jnp.uint32), (n,)))
    sid = padv(jnp.broadcast_to(jnp.asarray(sample_id, jnp.uint32), (n,)))
    m = n + pad

    n_lvl = levels + 1
    r_ctx = (3 + n_lvl + 7) // 8 * 8
    rnds = [random_1d(RandomTarget.LIGHT_TREE_LEVEL, pid, sid, dk * 8 + lvl)
            for lvl in range(n_lvl)]
    ctx = jnp.stack(
        [px, py, pz] + rnds
        + [jnp.zeros((m,), jnp.float32)] * (r_ctx - 3 - n_lvl), axis=0)

    sti = jnp.zeros((8, m), jnp.int32)
    sti = sti.at[1].set(-1)  # slot
    stf = jnp.zeros((8, m), jnp.float32)
    stf = stf.at[0].set(1.0)  # pdf

    for lvl in range(n_lvl):
        fetch = jnp.where(sti[3] == 0, sti[0], 0)
        augT = aug[fetch].T  # [176, m] — THE gather
        sti, stf = _run_level(
            ctx, sti, stf, augT, num_nodes=num_nodes, lvl=lvl,
            r_ctx=r_ctx, interpret=interpret)

    slot = sti[1][:n]
    pdf = stf[0][:n]
    valid = (slot >= 0) & (pdf > 0.0)
    return slot, pdf, valid
