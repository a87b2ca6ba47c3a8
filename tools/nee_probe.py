"""Fine-grained NEE cost probes: where do descent/candidate milliseconds go?

Marginal-cost protocol (docs/PERF_NOTES.md bench pitfalls): every probe
runs its op K times CHAINED inside one executable (each iteration feeds
the next so XLA cannot elide or overlap-cache), and the reported number is
(T_k2 - T_k1) / (k2 - k1) — the ~25 ms per-call tunnel overhead cancels.

Usage: python tools/nee_probe.py [n_lanes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
L = 5600
K1, K2 = 2, 8

import jax
import jax.numpy as jnp

from luminary_tpu.ops.light_tree import build_light_tree, sample_light_tree
from luminary_tpu.ops.vec import Vec3


def marginal(name, make_fn, reps=4):
    """make_fn(k) -> jitted fn(seed) running the op k chained times."""
    f1, f2 = make_fn(K1), make_fn(K2)
    out = []
    for f in (f1, f2):
        jax.block_until_ready(f(jnp.uint32(0)))
        ts = []
        for i in range(1, reps + 1):
            t0 = time.perf_counter()
            jax.block_until_ready(f(jnp.uint32(i)))
            ts.append(time.perf_counter() - t0)
        out.append(min(ts))
    per = (out[1] - out[0]) / (K2 - K1)
    print(f"{name:46s} {per * 1e3:9.2f} ms/op   (t{K1}={out[0]*1e3:.1f} "
          f"t{K2}={out[1]*1e3:.1f})", flush=True)
    return per


def main():
    rng = np.random.default_rng(3)
    c = rng.uniform(0, 50, (L, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.2, (L, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.2, (L, 3)).astype(np.float32)
    v0 = (c - (e1 + e2) / 3).astype(np.float32)
    corners = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    power = rng.uniform(0.5, 8.0, L).astype(np.float32)
    tree = build_light_tree(c, corners, power, np.arange(L, dtype=np.int32))
    print(f"tree: nodes={tree.num_nodes} rows={tree.rows.shape[0]} "
          f"levels={tree.levels}  N={N}", flush=True)
    rows = jnp.asarray(tree.rows)
    R = tree.rows.shape[0]

    px = jnp.asarray(rng.uniform(0, 50, N).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 5, N).astype(np.float32))
    pz = jnp.asarray(rng.uniform(0, 50, N).astype(np.float32))
    pid = jnp.arange(N, dtype=jnp.uint32)
    idx0 = jnp.asarray(rng.integers(0, R, N).astype(np.int32))

    # 1. row gather [N] -> [N, 128] chained (index depends on prev sum)
    def mk_gather(k):
        @jax.jit
        def f(s):
            acc = s.astype(jnp.int32)
            idx = idx0
            for _ in range(k):
                g = rows[idx]
                acc = acc + g[:, 0].astype(jnp.int32)
                idx = (idx + 1 + (acc & 1)) % R
            return acc

        return f

    marginal("row gather [N,128]", mk_gather)

    # 2. gather + transpose
    def mk_gather_t(k):
        @jax.jit
        def f(s):
            acc = s.astype(jnp.int32)
            idx = idx0
            for _ in range(k):
                g = rows[idx].T  # [128, N]
                acc = acc + g[0].astype(jnp.int32)
                idx = (idx + 1 + (acc & 1)) % R
            return acc

        return f

    marginal("row gather [N,128] + .T", mk_gather_t)

    # 3. narrow gather [N, 18]
    rows18 = jnp.asarray(rng.uniform(size=(L, 18)).astype(np.float32))

    def mk_g18(k):
        @jax.jit
        def f(s):
            acc = s.astype(jnp.int32)
            idx = idx0 % L
            for _ in range(k):
                g = rows18[idx]
                acc = acc + g[:, 0].astype(jnp.int32)
                idx = (idx + 1 + (acc & 1)) % L
            return acc

        return f

    marginal("row gather [N,18]", mk_g18)

    # 4. full descents, chained via position perturbation
    def mk_descent(force):
        def mk(k):
            @jax.jit
            def f(s):
                pos = Vec3(px, py, pz)
                acc = jnp.zeros((N,), jnp.float32)
                for i in range(k):
                    slot, pdf, valid = sample_light_tree(
                        rows, tree.num_nodes, tree.levels,
                        Vec3(pos.x + acc * 1e-6, pos.y, pos.z),
                        pid, s + i, 0, force=force)
                    acc = acc + pdf
                return acc

            return f

        return mk

    t_x = marginal("descent XLA (%d lvls)" % (tree.levels + 1),
                   mk_descent("xla"))
    from luminary_tpu.ops import light_tree_pallas as ltp

    t_p = marginal("descent Pallas GB=%d" % ltp.GB, mk_descent("pallas"))
    print(f"  pallas speedup {t_x / t_p:.2f}x", flush=True)


if __name__ == "__main__":
    main()


def candidate_probes():
    """Decompose one alias-candidate's cost (draw + 2 gathers + math)."""
    rng = np.random.default_rng(3)
    c = rng.uniform(0, 50, (L, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.2, (L, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.2, (L, 3)).astype(np.float32)
    v0 = (c - (e1 + e2) / 3).astype(np.float32)
    from luminary_tpu.ops.lights import pack_lights, sample_light_point
    from luminary_tpu.ops.random import RandomTarget, random_1d, random_2d
    from luminary_tpu.render.device_scene import (
        LSR_COLS, LSR_V0, LSR_E1, LSR_E2, LSR_FACE_N, LSR_EMISSION,
        LSR_AREA, LSR_SELECT_PDF)

    lights = pack_lights(
        v0, e1, e2, material_id=np.zeros(L, np.int32),
        emission=np.asarray([[8.0, 7.0, 5.0]], np.float32),
        emissive_flags=np.ones(1, bool), valid_slot=np.ones(L, bool))
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
    lsr_j = jnp.asarray(lsr)
    # [L, 5] denormalized alias rows (prob, slot_j, pdf_j, slot_a, pdf_a):
    # DeviceLights dropped its light_rows table when production draws moved
    # to the fused light_slot_rows (device_scene.py LSR_ALIAS_*); the probe
    # rebuilds the equivalent locally from prob/alias/slot/select_pdf.
    _prob = np.asarray(lights.prob, np.float32)
    _alias = np.asarray(lights.alias, np.int32)
    _slot = np.asarray(lights.slot, np.int32)
    _spdf = np.asarray(lights.select_pdf, np.float32)
    _rows = np.zeros((_prob.shape[0], 5), np.float32)
    _rows[:, 0] = _prob
    _rows[:, 1] = _slot.view(np.float32)
    _rows[:, 2] = _spdf
    _rows[:, 3] = _slot[_alias].view(np.float32)
    _rows[:, 4] = _spdf[_alias]
    light_rows = jnp.asarray(_rows)
    lights = jax.tree_util.tree_map(jnp.asarray, lights)

    px = jnp.asarray(rng.uniform(0, 50, N).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 5, N).astype(np.float32))
    pz = jnp.asarray(rng.uniform(0, 50, N).astype(np.float32))
    pid = jnp.arange(N, dtype=jnp.uint32)

    def mk_stage(stage):
        def mk(k):
            @jax.jit
            def f(s):
                acc = jnp.zeros((N,), jnp.float32)
                for i in range(k):
                    sid = s + i
                    dk = (acc > 1e30).astype(jnp.uint32)  # 0, data-dep
                    r = random_2d(RandomTarget.LIGHT_TREE, pid + dk, sid, 0)
                    ll = lights.prob.shape[0]
                    idx = jnp.minimum((r[..., 0] * ll).astype(jnp.int32),
                                      ll - 1)
                    if stage == "draw":
                        acc = acc + idx
                        continue
                    lrow = light_rows[idx]
                    take = r[..., 1] >= lrow[:, 0]
                    slot = jax.lax.bitcast_convert_type(
                        jnp.where(take, lrow[:, 3], lrow[:, 1]), jnp.int32)
                    pdfs = jnp.where(take, lrow[:, 4], lrow[:, 2])
                    if stage == "lrow":
                        acc = acc + pdfs
                        continue
                    row = lsr_j[slot]
                    if stage == "srow":
                        acc = acc + row[:, 0]
                        continue
                    # full candidate math
                    r2 = random_2d(RandomTarget.LIGHT_TRIANGLE, pid, sid, 0)
                    su = jnp.sqrt(jnp.clip(r2[..., 0], 1e-8, 1.0))
                    b1 = 1.0 - su
                    b2 = r2[..., 1] * su
                    pxl = (row[:, LSR_V0] + row[:, LSR_E1] * b1
                           + row[:, LSR_E2] * b2)
                    pyl = (row[:, LSR_V0 + 1] + row[:, LSR_E1 + 1] * b1
                           + row[:, LSR_E2 + 1] * b2)
                    pzl = (row[:, LSR_V0 + 2] + row[:, LSR_E1 + 2] * b1
                           + row[:, LSR_E2 + 2] * b2)
                    dx, dy, dz = pxl - px, pyl - py, pzl - pz
                    d2 = dx * dx + dy * dy + dz * dz
                    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
                    inv = 1.0 / dist
                    cos_l = -(row[:, LSR_FACE_N] * dx + row[:, LSR_FACE_N + 1]
                              * dy + row[:, LSR_FACE_N + 2] * dz) * inv
                    lum = (0.2126 * row[:, LSR_EMISSION] + 0.7152
                           * row[:, LSR_EMISSION + 1]
                           + 0.0722 * row[:, LSR_EMISSION + 2])
                    phat = lum * jnp.maximum(cos_l, 0.0) * inv * inv
                    pdf_sa = (pdfs / jnp.maximum(row[:, LSR_AREA], 1e-12)
                              * d2 / jnp.maximum(cos_l, 1e-8))
                    w_k = jnp.where((phat > 0) & (pdf_sa > 1e-12),
                                    phat / jnp.maximum(pdf_sa, 1e-12), 0.0)
                    rk = random_1d(RandomTarget.LIGHT_RIS, pid, sid, 0)
                    acc = acc + jnp.where(rk * (acc + w_k) < w_k, w_k, 0.0)
                return acc

            return f

        return mk

    for st in ("draw", "lrow", "srow", "full"):
        marginal("alias cand stage=%s" % st, mk_stage(st))

    # batched: 4 candidates' light_rows + lsr gathers as ONE flat gather
    def mk_batched(k):
        @jax.jit
        def f(s):
            acc = jnp.zeros((N,), jnp.float32)
            K = 4
            for i in range(k):
                sid = s + i
                rs = [random_2d(RandomTarget.LIGHT_TREE, pid, sid, j)
                      for j in range(K)]
                ll = lights.prob.shape[0]
                idx4 = jnp.concatenate([
                    jnp.minimum((r[..., 0] * ll).astype(jnp.int32), ll - 1)
                    for r in rs])                        # [4N]
                lrow4 = light_rows[idx4]                 # one gather
                take4 = jnp.concatenate(
                    [r[..., 1] for r in rs]) >= lrow4[:, 0]
                slot4 = jax.lax.bitcast_convert_type(
                    jnp.where(take4, lrow4[:, 3], lrow4[:, 1]), jnp.int32)
                row4 = lsr_j[slot4]                      # one gather
                acc = acc + jnp.sum(
                    row4[:, 0].reshape(4, N), axis=0)
            return acc

        return f

    marginal("4-cand gathers BATCHED (2 flat gathers)", mk_batched)


candidate_probes()
