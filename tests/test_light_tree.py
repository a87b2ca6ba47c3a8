"""Light tree: build invariants, descent pdf correctness, sampling quality.

Reference behavior target: device_light.c (Estevez-Kulla tree) +
light_tree.cuh stochastic traversal. The TPU contract tested here:
  * every emissive triangle appears in exactly one leaf slot;
  * the descent's reported pdf matches an exhaustive host enumeration of
    branch probabilities, and pdfs over all lights sum to 1;
  * empirical selection frequencies match the pdfs.
"""

import numpy as np
import pytest

from luminary_tpu.ops.light_tree import (
    INVALID,
    TREE_LEAF,
    build_light_tree,
    sample_light_tree,
)


def _random_lights(n=300, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    power = rng.uniform(0.1, 30.0, n).astype(np.float32)
    slots = np.arange(100, 100 + n, dtype=np.int32)  # arbitrary slot ids
    centroid = v0 + (e1 + e2) / 3.0
    corners = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    return centroid, corners, power, slots


def _oct_unpack_np(col):
    """numpy twin of light_tree._unpack_oct_f16 (packed axis columns)."""
    bits = np.atleast_1d(np.asarray(col, np.float32)).view(np.uint32)
    lo = (bits & 0xFFFF).astype(np.uint16).view(np.float16).astype(np.float64)
    hi = (bits >> 16).astype(np.uint16).view(np.float16).astype(np.float64)
    u, v = lo, hi
    y = 1.0 - np.abs(u) - np.abs(v)
    neg = y < 0.0
    x = np.where(neg, (1.0 - np.abs(v)) * np.where(u >= 0, 1.0, -1.0), u)
    z = np.where(neg, (1.0 - np.abs(u)) * np.where(v >= 0, 1.0, -1.0), v)
    n = np.stack([x, y, z], -1)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def _enumerate_pdfs(tree, pos):
    """Host reference: probability of reaching each light from `pos`,
    including the orientation-cone factors."""
    from luminary_tpu.ops.light_tree import CONE_EPS

    rows = tree.rows
    out = {}

    def imp_node(row, k):
        cx, cy, cz = row[0 * 16 + k], row[1 * 16 + k], row[2 * 16 + k]
        rad, pw = row[3 * 16 + k], row[4 * 16 + k]
        d2 = (cx - pos[0]) ** 2 + (cy - pos[1]) ** 2 + (cz - pos[2]) ** 2
        base = pw / max(d2, max(rad * rad, 1e-8))
        axis = _oct_unpack_np(row[6 * 16 + k])[0]
        to_x = np.array([pos[0] - cx, pos[1] - cy, pos[2] - cz])
        d = max(np.linalg.norm(to_x), 1e-6)
        cos_t = float(np.clip(axis @ (to_x / d), -1.0, 1.0))
        sin_t = np.sqrt(max(1.0 - cos_t**2, 0.0))
        cos_o = float(np.clip(row[7 * 16 + k], -1.0, 1.0))
        sin_o = np.sqrt(max(1.0 - cos_o**2, 0.0))
        c1 = 1.0 if cos_t >= cos_o else cos_t * cos_o + sin_t * sin_o
        s1 = np.sqrt(max(1.0 - c1 * c1, 0.0))
        sin_u = min(rad / d, 1.0)
        cos_u = np.sqrt(max(1.0 - sin_u**2, 0.0))
        c2 = 1.0 if c1 >= cos_u else c1 * cos_u + s1 * sin_u
        return base * max(c2, CONE_EPS)

    def walk(row_id, p):
        row = rows[row_id]
        if row_id >= tree.num_nodes:  # leaf
            slots = row[0:14].view(np.int32)
            pw = row[14:28]
            cx, cy, cz = row[28:42], row[42:56], row[56:70]
            d2 = (cx - pos[0]) ** 2 + (cy - pos[1]) ** 2 + (cz - pos[2]) ** 2
            nrm = _oct_unpack_np(row[70:84])
            tx = np.stack([pos[0] - cx, pos[1] - cy, pos[2] - cz], -1)
            d = np.maximum(np.linalg.norm(tx, axis=-1), 1e-6)
            l_cos = (nrm * (tx / d[:, None])).sum(-1)
            face = np.maximum(l_cos, CONE_EPS)
            imp = np.where(slots >= 0, pw * face / np.maximum(d2, 1e-8), 0.0)
            tot = imp.sum()
            for k in range(TREE_LEAF):
                if slots[k] >= 0 and imp[k] > 0:
                    out[int(slots[k])] = out.get(int(slots[k]), 0.0) + p * imp[k] / tot
            return
        codes = row[5 * 16 : 6 * 16].view(np.int32)
        imps = np.array(
            [0.0 if codes[k] == INVALID else imp_node(row, k) for k in range(16)]
        )
        tot = imps.sum()
        for k in range(16):
            if imps[k] > 0:
                c = codes[k]
                nxt = tree.num_nodes + ~c if c < 0 else c
                walk(nxt, p * imps[k] / tot)

    walk(0, 1.0)
    return out


def test_build_covers_every_light_once():
    centroid, corners, power, slots = _random_lights()
    tree = build_light_tree(centroid, corners, power, slots)
    leaf = tree.rows[tree.num_nodes :]
    got = leaf[:, 0:14].view(np.int32).reshape(-1)
    got = np.sort(got[got >= 0])
    np.testing.assert_array_equal(got, np.sort(slots))


def test_descent_pdf_matches_enumeration():
    import jax.numpy as jnp

    from luminary_tpu.ops.vec import Vec3

    centroid, corners, power, slots = _random_lights(n=200, seed=3)
    tree = build_light_tree(centroid, corners, power, slots)
    pos = np.array([1.5, 2.0, -3.0], np.float32)
    ref = _enumerate_pdfs(tree, pos)
    assert abs(sum(ref.values()) - 1.0) < 1e-4

    n = 4096
    pv = Vec3(*(jnp.full((n,), pos[i]) for i in range(3)))
    pixel_id = jnp.arange(n, dtype=jnp.uint32)
    slot, pdf, valid = sample_light_tree(
        jnp.asarray(tree.rows), tree.num_nodes, tree.levels, pv,
        pixel_id, jnp.uint32(7), 0,
    )
    slot, pdf, valid = np.asarray(slot), np.asarray(pdf), np.asarray(valid)
    assert valid.all()
    # reported pdf must equal the enumerated pdf of the selected light
    expect = np.array([ref[int(s)] for s in slot])
    np.testing.assert_allclose(pdf, expect, rtol=2e-3)
    # empirical frequency of the most likely lights tracks the pdf
    top = sorted(ref, key=ref.get)[-5:]
    for s in top:
        emp = (slot == s).mean()
        assert abs(emp - ref[s]) < 5 * np.sqrt(ref[s] * (1 - ref[s]) / n) + 1e-3


@pytest.mark.parametrize("seed", [0, 1])
def test_descent_prefers_near_lights(seed):
    import jax.numpy as jnp

    from luminary_tpu.ops.vec import Vec3

    rng = np.random.default_rng(seed)
    # two clusters of equal power: one near the query point, one far
    n_half = 64
    v0 = np.concatenate([
        rng.uniform(-1, 1, (n_half, 3)),
        rng.uniform(99, 101, (n_half, 3)),
    ]).astype(np.float32)
    e1 = np.tile(np.array([[0.1, 0, 0]], np.float32), (2 * n_half, 1))
    e2 = np.tile(np.array([[0, 0.1, 0]], np.float32), (2 * n_half, 1))
    power = np.full(2 * n_half, 5.0, np.float32)
    slots = np.arange(2 * n_half, dtype=np.int32)
    tree = build_light_tree(
        v0 + (e1 + e2) / 3.0, np.stack([v0, v0 + e1, v0 + e2], 1), power, slots
    )
    n = 2048
    pv = Vec3(jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)))
    slot, pdf, valid = sample_light_tree(
        jnp.asarray(tree.rows), tree.num_nodes, tree.levels, pv,
        jnp.arange(n, dtype=jnp.uint32), jnp.uint32(1), 0,
    )
    near_frac = (np.asarray(slot) < n_half).mean()
    assert near_frac > 0.95, near_frac  # far cluster ~ (1/100)^2 importance


def test_descent_prefers_facing_lights():
    """Orientation cones (reference device_light.c cone terms): panels
    FACING the query point must absorb almost all selection probability
    over equal-power panels facing away."""
    import jax.numpy as jnp

    from luminary_tpu.ops.vec import Vec3

    rng = np.random.default_rng(2)
    n_half = 64
    # all panels on the y=5 plane above the query; first half wound so the
    # face normal points DOWN (toward the origin), second half UP (away)
    base = rng.uniform(-6, 6, (2 * n_half, 3)).astype(np.float32)
    base[:, 1] = 5.0
    e_down1 = np.tile(np.array([[0.3, 0, 0]], np.float32), (n_half, 1))
    e_down2 = np.tile(np.array([[0, 0, 0.3]], np.float32), (n_half, 1))
    # cross(e1, e2): (0.3,0,0)x(0,0,0.3) = (0*0.3-0*0, 0*0-0.3*0.3, 0) → -y
    e1 = np.concatenate([e_down1, e_down2])
    e2 = np.concatenate([e_down2, e_down1])
    power = np.full(2 * n_half, 5.0, np.float32)
    slots = np.arange(2 * n_half, dtype=np.int32)
    tree = build_light_tree(
        base + (e1 + e2) / 3.0, np.stack([base, base + e1, base + e2], 1),
        power, slots)
    n = 4096
    pv = Vec3(jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)))
    slot, pdf, valid = sample_light_tree(
        jnp.asarray(tree.rows), tree.num_nodes, tree.levels, pv,
        jnp.arange(n, dtype=jnp.uint32), jnp.uint32(1), 0,
    )
    facing_frac = (np.asarray(slot) < n_half).mean()
    assert facing_frac > 0.85, facing_frac


def test_descent_pallas_matches_xla():
    """The fused Pallas descent (ops/light_tree_pallas.py) must pick the
    SAME slots with the SAME pdfs as the XLA path given identical randoms
    (interpret mode on CPU)."""
    import jax.numpy as jnp

    from luminary_tpu.ops.vec import Vec3

    centroid, corners, power, slots = _random_lights(n=300, seed=5)
    tree = build_light_tree(centroid, corners, power, slots)
    rng = np.random.default_rng(9)
    n = 2048
    pv = Vec3(jnp.asarray(rng.uniform(-20, 20, n).astype(np.float32)),
              jnp.asarray(rng.uniform(-2, 8, n).astype(np.float32)),
              jnp.asarray(rng.uniform(-20, 20, n).astype(np.float32)))
    pid = jnp.arange(n, dtype=jnp.uint32)
    rows = jnp.asarray(tree.rows)
    sx, px, vx = sample_light_tree(
        rows, tree.num_nodes, tree.levels, pv, pid, jnp.uint32(4), 0,
        force="xla")
    sp, pp, vp = sample_light_tree(
        rows, tree.num_nodes, tree.levels, pv, pid, jnp.uint32(4), 0,
        force="pallas")
    sx, sp = np.asarray(sx), np.asarray(sp)
    agree = (sx == sp).mean()
    assert agree > 0.999, agree  # fp-boundary flips only
    same = (sx == sp) & np.asarray(vx) & np.asarray(vp)
    np.testing.assert_allclose(
        np.asarray(pp)[same], np.asarray(px)[same], rtol=1e-4)
