"""Microbenchmark the NEE machinery: light-tree descent + RIS candidate loop.

Round-3 profile: ~1700 ms of the 3030 ms/sample tree-tier 1080p DEFAULT
budget is NEE sampling (docs/PERF_NOTES.md "Round 3 final state").  This
tool times each piece standalone on a synthetic-but-realistic light set so
the fused Pallas variants (ops/light_tree_pallas.py) can be validated and
measured without a 2-minute scene pack.

Usage:  python tools/microbench_nee.py [n_lanes] [n_lights]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
L = int(sys.argv[2]) if len(sys.argv) > 2 else 5600

import jax
import jax.numpy as jnp

from luminary_tpu.ops.light_tree import build_light_tree, sample_light_tree
from luminary_tpu.ops.lights import pack_lights, sample_light_point
from luminary_tpu.ops.random import RandomTarget, random_1d
from luminary_tpu.ops.vec import Vec3
from luminary_tpu.render.device_scene import (
    LSR_COLS, LSR_V0, LSR_E1, LSR_E2, LSR_FACE_N, LSR_EMISSION, LSR_AREA,
    LSR_SELECT_PDF,
)


def timeit(name, fn, *args, reps=6):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:46s} {best * 1e3:9.2f} ms", flush=True)
    return out, best


def main():
    rng = np.random.default_rng(3)
    # emissive triangles scattered over a 50-unit field (tree-tier-like)
    c = rng.uniform(0, 50, (L, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.2, (L, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.2, (L, 3)).astype(np.float32)
    v0 = (c - (e1 + e2) / 3).astype(np.float32)
    corners = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    power = rng.uniform(0.5, 8.0, L).astype(np.float32)
    slots = np.arange(L, dtype=np.int32)

    t0 = time.time()
    tree = build_light_tree(c, corners, power, slots)
    print(f"tree build: {time.time() - t0:.2f}s  nodes={tree.num_nodes} "
          f"rows={tree.rows.shape[0]} levels={tree.levels}", flush=True)

    tree_rows = jnp.asarray(tree.rows)
    pos = Vec3(jnp.asarray(rng.uniform(0, 50, N).astype(np.float32)),
               jnp.asarray(rng.uniform(0, 5, N).astype(np.float32)),
               jnp.asarray(rng.uniform(0, 50, N).astype(np.float32)))
    pid = jnp.arange(N, dtype=jnp.uint32)

    # --- descent: XLA vs Pallas ---
    def descent(pos, sid, force):
        return sample_light_tree(
            tree_rows, tree.num_nodes, tree.levels, pos, pid, sid, 0,
            force=force)

    sid = jnp.uint32(1)
    d_xla = jax.jit(lambda p, s: descent(p, s, "xla"))
    (s_x, p_x, v_x), t_xla = timeit("descent XLA", d_xla, pos, sid)

    try:
        d_pal = jax.jit(lambda p, s: descent(p, s, "pallas"))
        (s_p, p_p, v_p), t_pal = timeit("descent Pallas", d_pal, pos, sid)
        agree = float(jnp.mean((s_x == s_p).astype(jnp.float32)))
        pdf_err = float(jnp.max(jnp.where(
            v_x & v_p & (s_x == s_p),
            jnp.abs(p_x - p_p) / jnp.maximum(p_x, 1e-12), 0.0)))
        print(f"  slots agree: {agree * 100:.3f}%  max rel pdf err "
              f"(same slot): {pdf_err:.2e}   speedup {t_xla / t_pal:.2f}x",
              flush=True)
    except Exception as e:
        import traceback
        traceback.print_exc()
        print(f"  descent Pallas FAILED: {type(e).__name__}", flush=True)

    # --- K=4 candidate loop (alias draws + light-row math, big-scene
    # path: light_rows gather + light_slot_rows gather per candidate),
    # faithful to render/wavefront.py lines ~731-813 ---
    lights = pack_lights(
        v0, e1, e2,
        material_id=np.zeros(L, np.int32),
        emission=np.asarray([[8.0, 7.0, 5.0]], np.float32),
        emissive_flags=np.ones(1, bool),
        valid_slot=np.ones(L, bool),
    )
    # slim per-slot rows (LSR_* layout), slot space == light index here
    lsr = np.zeros((L, LSR_COLS), np.float32)
    lsr[:, LSR_V0:LSR_V0 + 3] = v0
    lsr[:, LSR_E1:LSR_E1 + 3] = e1
    lsr[:, LSR_E2:LSR_E2 + 3] = e2
    nrm = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(nrm, axis=-1)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    lsr[:, LSR_FACE_N:LSR_FACE_N + 3] = nrm
    lsr[:, LSR_EMISSION:LSR_EMISSION + 3] = (8.0, 7.0, 5.0)
    lsr[:, LSR_AREA] = area
    sel_np = np.zeros(L, np.float32)
    sel_np[np.asarray(lights.slot)] = np.asarray(lights.select_pdf)
    lsr[:, LSR_SELECT_PDF] = sel_np
    lsr = jnp.asarray(lsr)
    lights = jax.tree_util.tree_map(jnp.asarray, lights)

    def cand_loop(pos, sid, k_ris, use_tree):
        n = pos.x.shape[0]
        zeros = jnp.zeros((n,), jnp.float32)
        wsum = zeros
        sel_phat = zeros
        sel_dir = Vec3(zeros, zeros, jnp.ones((n,), jnp.float32))
        for k in range(k_ris):
            dk = k
            if use_tree and k == 0:
                t_slot, t_pdf, t_valid = sample_light_tree(
                    tree_rows, tree.num_nodes, tree.levels, pos, pid, sid,
                    dk, force=use_tree if use_tree != "tree-xla" else "xla")
                cand = dict(slot=t_slot, pdf_select=t_pdf, sel_valid=t_valid)
            else:
                cand = {}
            slot, point, nrm_v, pdf_area, pdf_alias, (ler, leg, leb), ok, _ = \
                sample_light_point(lights, lsr, pid, sid, dk, **cand)
            to_l = point - pos
            d2 = to_l.x**2 + to_l.y**2 + to_l.z**2
            dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
            inv = 1.0 / dist
            ldir = Vec3(to_l.x * inv, to_l.y * inv, to_l.z * inv)
            cos_l = -(nrm_v.x * ldir.x + nrm_v.y * ldir.y + nrm_v.z * ldir.z)
            lum = 0.2126 * ler + 0.7152 * leg + 0.0722 * leb
            phat = lum * jnp.maximum(cos_l, 0.0) * inv * inv
            pdf_sa = pdf_area * d2 / jnp.maximum(cos_l, 1e-8)
            w_k = jnp.where(ok & (phat > 0) & (pdf_sa > 1e-12),
                            phat / jnp.maximum(pdf_sa, 1e-12), 0.0)
            wsum = wsum + w_k
            if k == 0:
                take = w_k > 0
            else:
                r_k = random_1d(RandomTarget.LIGHT_RIS, pid, sid, dk)
                take = (r_k * wsum < w_k) & (w_k > 0)
            sel_phat = jnp.where(take, phat, sel_phat)
            sel_dir = Vec3(jnp.where(take, ldir.x, sel_dir.x),
                           jnp.where(take, ldir.y, sel_dir.y),
                           jnp.where(take, ldir.z, sel_dir.z))
        return wsum, sel_phat, sel_dir.x

    jl = jax.jit(cand_loop, static_argnames=("k_ris", "use_tree"))
    timeit("cand loop K=1 alias only", jl, pos, sid, 1, False)
    timeit("cand loop K=4 alias only", jl, pos, sid, 4, False)
    timeit("cand loop K=4 + tree(XLA) cand0", jl, pos, sid, 4, "tree-xla")
    try:
        timeit("cand loop K=4 + tree(Pallas) cand0", jl, pos, sid, 4, "pallas")
    except Exception as e:
        print(f"  pallas-in-loop FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
