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

Round-3 ran this as an AUGMENTED [R, 176] gather (axes pre-decoded into
the table because Mosaic cannot bitcast-decode the packed f16 octahedral
axes) followed by an XLA `.T` — and measured 0.75x: the two-tile rows and
the XLA transpose (a full relayout, ~10 consumer passes worth —
tools/microbench_colext.py) cost more than the fused math saved. Round 5
splits it: the gather rides `gather_planar` (128-col rows, one-pass Pallas
transpose) and the f16 axes/normals are decoded at XLA level into a
separate [48, m] planar input — a few cheap row ops.

State (per lane, lanes-major [8, m]):
  sti i32: rows 0 node, 1 slot, 2 at_leaf, 3 done
  stf f32: row 0 pdf
Context (read-only [R_ctx, m]): rows 0:3 shading point xyz,
  row 3+lvl the level's uniform random.
Ext (read-only [48, m]): decoded cone axes (node rows: x 0:16, y 16:32,
  z 32:48) or leaf normals (leaf rows: x 0:14, y 16:30, z 32:46).
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
EXT_ROWS = 48
# Lane-axis block per grid step. Descent lanes are INDIVIDUAL shading
# points (not 16-ray packets like the traversal), so the grid is 16x
# longer per wavefront — a larger block amortizes the per-block dispatch
# cost (measured: 512 → 4096 matters at 1M+ lanes). ~3 MB augT block.
GB = int(_os.environ.get("LUM_NEE_GB", "4096"))

_INVALID = np.int32(0x7FFFFFFF)
_CONE_EPS = np.float32(0.01)  # keep in sync with light_tree.CONE_EPS


def decode_ext_rows(rowT: jnp.ndarray, fetch: jnp.ndarray,
                    num_nodes: int) -> jnp.ndarray:
    """Planar gathered rows [128, m] + per-lane fetch index -> the decoded
    [48, m] axes/normals block (jnp — Mosaic cannot do 16-bit bitcasts)."""
    from .light_tree import _unpack_oct_f16

    m = rowT.shape[1]
    ax, ay, az = _unpack_oct_f16(rowT[96:112])  # node cone axes [16, m]
    lx, ly, lz = _unpack_oct_f16(rowT[70:84])   # leaf normals  [14, m]
    pad2 = jnp.zeros((2, m), jnp.float32)
    is_node = (fetch < num_nodes)[None, :]
    return jnp.concatenate([
        jnp.where(is_node, ax, jnp.concatenate([lx, pad2], axis=0)),
        jnp.where(is_node, ay, jnp.concatenate([ly, pad2], axis=0)),
        jnp.where(is_node, az, jnp.concatenate([lz, pad2], axis=0)),
    ], axis=0)


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

    def kernel(ctx_ref, sti_ref, stf_ref, rowT_ref, ext_ref, osti_ref,
               ostf_ref):
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
            aug = rowT_ref
            dx = aug[0:16] - px           # [16, GB]
            dy = aug[16:32] - py
            dz = aug[32:48] - pz
            rad = aug[48:64]
            pw = aug[64:80]
            code16 = jax.lax.bitcast_convert_type(aug[80:96], jnp.int32)
            d2 = dx * dx + dy * dy + dz * dz
            imp = pw / jnp.maximum(d2, jnp.maximum(rad * rad, 1e-8))
            # orientation-cone factor (see light_tree.py for the math)
            ax = ext_ref[0:16]
            ay = ext_ref[16:32]
            az = ext_ref[32:48]
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
            aug = rowT_ref
            lslot = jax.lax.bitcast_convert_type(aug[0:14], jnp.int32)
            lpw = aug[14:28]
            ldx = aug[28:42] - px
            ldy = aug[42:56] - py
            ldz = aug[56:70] - pz
            ld2 = ldx * ldx + ldy * ldy + ldz * ldz
            lnx = ext_ref[0:14]
            lny = ext_ref[16:30]
            lnz = ext_ref[32:46]
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
    static_argnames=("num_nodes", "lvl", "r_ctx", "interpret",
                     "root_bcast"),
)
def _run_level(ctx, sti, stf, rowT, ext, *, num_nodes, lvl, r_ctx, interpret,
               root_bcast=False):
    m = sti.shape[1]
    grid = m // GB
    kernel = _make_level_kernel(num_nodes, lvl)
    imap = lambda i: (0, i)
    # level 0: every lane reads the root — rowT/ext are ONE [.., GB] block
    # every grid step maps to (no per-lane gather, no m-wide broadcast)
    imap_row = (lambda i: (0, 0)) if root_bcast else imap
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((r_ctx, GB), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, GB), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, GB), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((128, GB), imap_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((EXT_ROWS, GB), imap_row, memory_space=pltpu.VMEM),
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
    )(ctx, sti, stf, rowT, ext)


def descend_pallas(tree_rows, num_nodes: int, levels: int, pos: Vec3,
                   pixel_id, sample_id, dk: int, interpret: bool = False,
                   bn=None):
    """Fused-body equivalent of one sample_light_tree descent chunk.

    Same state machine and numerics as the XLA path (identical slot picks
    given identical randoms — bn passes the blue-noise channels through so
    the random streams match exactly). Returns (slot i32 [n], pdf f32 [n],
    valid bool [n])."""
    from .random import RandomTarget, random_1d
    from .rowops import gather_planar

    n = pos.x.shape[0]
    pad = (-n) % GB

    def padv(x, fill=0):
        return (jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
                if pad else x)

    px, py, pz = padv(pos.x), padv(pos.y), padv(pos.z)
    pid = padv(jnp.broadcast_to(jnp.asarray(pixel_id, jnp.uint32), (n,)))
    sid = padv(jnp.broadcast_to(jnp.asarray(sample_id, jnp.uint32), (n,)))
    bnp = tuple(padv(b) for b in bn) if bn is not None else None
    m = n + pad

    n_lvl = levels + 1
    r_ctx = (3 + n_lvl + 7) // 8 * 8
    rnds = [random_1d(RandomTarget.LIGHT_TREE_LEVEL, pid, sid, dk * 8 + lvl,
                      bn=bnp)
            for lvl in range(n_lvl)]
    ctx = jnp.stack(
        [px, py, pz] + rnds
        + [jnp.zeros((m,), jnp.float32)] * (r_ctx - 3 - n_lvl), axis=0)

    sti = jnp.zeros((8, m), jnp.int32)
    sti = sti.at[1].set(-1)  # slot
    stf = jnp.zeros((8, m), jnp.float32)
    stf = stf.at[0].set(1.0)  # pdf

    for lvl in range(n_lvl):
        if lvl == 0:
            # every lane starts at the root: one GB-wide root block
            # instead of an m-lane dup-index gather
            rowT = jnp.broadcast_to(tree_rows[0][:, None], (128, GB))
            ext = decode_ext_rows(rowT, jnp.zeros((GB,), jnp.int32),
                                  num_nodes)
        else:
            fetch = jnp.where(sti[3] == 0, sti[0], 0)
            rowT = gather_planar(tree_rows, fetch)  # [128, m] — THE gather
            ext = decode_ext_rows(rowT, fetch, num_nodes)
        sti, stf = _run_level(
            ctx, sti, stf, rowT, ext, num_nodes=num_nodes, lvl=lvl,
            r_ctx=r_ctx, interpret=interpret, root_bcast=(lvl == 0))

    slot = sti[1][:n]
    pdf = stf[0][:n]
    valid = (slot >= 0) & (pdf > 0.0)
    return slot, pdf, valid
