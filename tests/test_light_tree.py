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


def _enumerate_pdfs(tree, pos):
    """Host reference: probability of reaching each light from `pos`."""
    rows = tree.rows
    out = {}

    def imp_node(row, k):
        cx, cy, cz = row[0 * 16 + k], row[1 * 16 + k], row[2 * 16 + k]
        rad, pw = row[3 * 16 + k], row[4 * 16 + k]
        d2 = (cx - pos[0]) ** 2 + (cy - pos[1]) ** 2 + (cz - pos[2]) ** 2
        return pw / max(d2, max(rad * rad, 1e-8))

    def walk(row_id, p):
        row = rows[row_id]
        if row_id >= tree.num_nodes:  # leaf
            slots = row[0:14].view(np.int32)
            pw = row[14:28]
            cx, cy, cz = row[28:42], row[42:56], row[56:70]
            d2 = (cx - pos[0]) ** 2 + (cy - pos[1]) ** 2 + (cz - pos[2]) ** 2
            imp = np.where(slots >= 0, pw / np.maximum(d2, 1e-8), 0.0)
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
