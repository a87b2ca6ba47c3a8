"""Pallas fused-body traversal vs the XLA reference path (interpret mode).

The Pallas body (ops/traverse_pallas.py) mirrors the XLA state machine op
for op; on TPU it runs compiled (verified bit-exact on-chip during round 3),
here the Pallas interpreter provides the same check on CPU CI.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from luminary_tpu.bvh.builder import build_bvh
from luminary_tpu.bvh.wide import WIDE_LEAF, collapse_bvh8
from luminary_tpu.ops.traverse import _traverse_wide, pack_device_bvh
from luminary_tpu.ops.traverse_pallas import traverse_wide_pallas
from luminary_tpu.ops.vec import Vec3


@pytest.fixture(scope="module")
def small_scene(module_rng=np.random.default_rng(7)):
    rng = module_rng
    num_tris = 600
    base = (rng.random((num_tris, 1, 3)) - 0.5) * 10.0
    offs = (rng.random((num_tris, 3, 3)) - 0.5) * 0.6
    corners = (base + offs).astype(np.float32)
    bvh2 = build_bvh(corners, leaf_size=WIDE_LEAF)
    wide = collapse_bvh8(bvh2)
    order = wide.tri_order
    valid = order >= 0
    safe = np.where(valid, order, 0)
    c = corners[safe]
    v0 = c[:, 0].copy()
    e1 = c[:, 1] - c[:, 0]
    e2 = c[:, 2] - c[:, 0]
    v0[~valid] = 0
    e1[~valid] = 0
    e2[~valid] = 0
    dbvh = jax.device_put(pack_device_bvh(wide, v0, e1, e2))

    n_rays = 2048  # pallas pads to one 8192-ray grid block internally
    origins = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * 20.0
    dirs = rng.standard_normal((n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = Vec3(*(jnp.asarray(origins[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    act = jnp.asarray(rng.random(n_rays) > 0.1)
    return dbvh, o, d, act, n_rays


def test_pallas_closest_matches_xla(small_scene):
    dbvh, o, d, act, n = small_scene
    t_max = jnp.full((n,), 3e38, jnp.float32)
    ref = _traverse_wide(dbvh, o, d, t_max, any_hit=False, active=act)
    got = traverse_wide_pallas(dbvh, o, d, t_max, any_hit=False, active=act,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.slot) == np.asarray(ref.slot)).all()
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-5)


def test_pallas_anyhit_matches_xla(small_scene):
    dbvh, o, d, act, n = small_scene
    t_max = jnp.full((n,), 5.0, jnp.float32)
    ref = _traverse_wide(dbvh, o, d, t_max, any_hit=True, active=act)
    got = traverse_wide_pallas(dbvh, o, d, t_max, any_hit=True, active=act,
                               interpret=True)
    assert ((np.asarray(got.slot) >= 0) == (np.asarray(ref.slot) >= 0)).all()


def test_pallas_sorted_compaction_matches(small_scene):
    """The optional packet-compaction mode permutes and un-permutes state;
    results must be identical to the unsorted mode."""
    dbvh, o, d, act, n = small_scene
    t_max = jnp.full((n,), 3e38, jnp.float32)
    a = traverse_wide_pallas(dbvh, o, d, t_max, any_hit=False, active=act,
                             interpret=True, sort_every=0)
    b = traverse_wide_pallas(dbvh, o, d, t_max, any_hit=False, active=act,
                             interpret=True, sort_every=2)
    np.testing.assert_allclose(np.asarray(b.t), np.asarray(a.t), rtol=1e-6)
    assert (np.asarray(b.slot) == np.asarray(a.slot)).all()


def test_native_wide_builder_matches_brute_force(rng):
    """lum_build_wide (quality collapse) vs brute-force intersection."""
    from luminary_tpu.bvh.native import build_wide_native
    from luminary_tpu.ops.intersect import ray_triangle
    from luminary_tpu.ops.traverse import trace_closest

    ntri = 900
    base = (rng.random((ntri, 1, 3)) - 0.5) * 10
    offs = (rng.random((ntri, 3, 3)) - 0.5) * 0.6
    corners = (base + offs).astype(np.float32)
    wide = build_wide_native(corners)
    if wide is None:
        pytest.skip("native builder unavailable")
    order = wide.tri_order
    valid = order >= 0
    assert valid.sum() == ntri  # no triangle lost or duplicated
    assert len(np.unique(order[valid])) == ntri
    safe = np.where(valid, order, 0)
    c = corners[safe]
    v0 = c[:, 0].copy()
    e1 = c[:, 1] - c[:, 0]
    e2 = c[:, 2] - c[:, 0]
    v0[~valid] = 0
    e1[~valid] = 0
    e2[~valid] = 0
    dbvh = jax.device_put(pack_device_bvh(wide, v0, e1, e2))

    nr = 256
    o = (rng.random((nr, 3)).astype(np.float32) - 0.5) * 20
    d = rng.standard_normal((nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    hit = trace_closest(dbvh, ov, dv)

    t, _, _, _ = ray_triangle(
        Vec3(*(jnp.asarray(o[:, j:j + 1]) for j in range(3))),
        Vec3(*(jnp.asarray(d[:, j:j + 1]) for j in range(3))),
        Vec3(*(jnp.asarray(corners[None, :, 0, j]) for j in range(3))),
        Vec3(*(jnp.asarray(corners[None, :, 1, j]
                           - corners[None, :, 0, j]) for j in range(3))),
        Vec3(*(jnp.asarray(corners[None, :, 2, j]
                           - corners[None, :, 0, j]) for j in range(3))),
    )
    t_ref = np.asarray(jnp.min(t, axis=1))
    np.testing.assert_allclose(np.asarray(hit.t), t_ref, rtol=1e-5, atol=1e-4)
