"""BVH build + traversal correctness vs brute-force intersection."""

import numpy as np
import pytest

import jax.numpy as jnp

from luminary_tpu.bvh.builder import BVH2, build_bvh
from luminary_tpu.bvh.wide import WIDE_LEAF, collapse_bvh8
from luminary_tpu.ops.intersect import MISS_DIST, ray_triangle
from luminary_tpu.ops.traverse import (
    DENSE_MAX_SLOTS,
    DeviceBVH,
    _traverse_wide,
    pack_device_bvh,
    trace_closest,
    trace_occluded,
)
from luminary_tpu.ops.vec import Vec3


def vec(arr):
    a = np.asarray(arr, np.float32)
    return Vec3(jnp.asarray(a[..., 0]), jnp.asarray(a[..., 1]), jnp.asarray(a[..., 2]))


def random_tris(rng, n, spread=10.0, size=0.5):
    base = (rng.random((n, 1, 3)) - 0.5) * spread
    offs = (rng.random((n, 3, 3)) - 0.5) * size
    return (base + offs).astype(np.float32)


def to_device_bvh(bvh: BVH2, corners: np.ndarray) -> DeviceBVH:
    import jax

    wide = collapse_bvh8(bvh)
    order = wide.tri_order
    valid = order >= 0
    safe = np.where(valid, order, 0)
    c = corners[safe] if corners.shape[0] else np.zeros((len(order), 3, 3), np.float32)
    v0, e1, e2 = c[:, 0].copy(), (c[:, 1] - c[:, 0]), (c[:, 2] - c[:, 0])
    v0[~valid] = 0
    e1[~valid] = 0
    e2[~valid] = 0
    return jax.device_put(pack_device_bvh(wide, v0, e1, e2))


def brute_force_t(corners, origins, dirs):
    """Closest-hit t per ray by testing all triangles."""

    def bcast_rows(a):
        v = vec(a)
        return Vec3(v.x[:, None], v.y[:, None], v.z[:, None])

    def bcast_cols(a):
        v = vec(a)
        return Vec3(v.x[None, :], v.y[None, :], v.z[None, :])

    t, _, _, _ = ray_triangle(
        bcast_rows(origins),
        bcast_rows(dirs),
        bcast_cols(corners[:, 0]),
        bcast_cols(corners[:, 1] - corners[:, 0]),
        bcast_cols(corners[:, 2] - corners[:, 0]),
    )
    return np.asarray(jnp.min(t, axis=-1))


@pytest.mark.parametrize("num_tris", [1, 5, 63, 300])
def test_traversal_matches_brute_force(rng, num_tris):
    corners = random_tris(rng, num_tris)
    bvh = build_bvh(corners, leaf_size=WIDE_LEAF)
    dbvh = to_device_bvh(bvh, corners)

    n_rays = 256
    origins = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * 20.0
    dirs = rng.standard_normal((n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    hit = trace_closest(dbvh, vec(origins), vec(dirs))
    t_ref = brute_force_t(corners, origins, dirs)
    t_got = np.asarray(hit.t)

    miss_ref = t_ref >= 1e30
    miss_got = t_got >= 1e30
    assert np.array_equal(miss_ref, miss_got), (
        f"miss mismatch: {np.sum(miss_ref != miss_got)} rays"
    )
    both = ~miss_ref
    assert np.allclose(t_got[both], t_ref[both], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("num_tris", [9, 80])
def test_wide_traversal_matches_dense_tier(rng, num_tris):
    """Force the wide-tree path on scenes small enough for the dense tier —
    the two tiers must agree exactly on hits."""
    corners = random_tris(rng, num_tris)
    bvh = build_bvh(corners, leaf_size=4)  # small leaves → deeper wide tree
    dbvh = to_device_bvh(bvh, corners)
    assert dbvh.tri_v0.x.shape[0] <= DENSE_MAX_SLOTS or num_tris == 80

    n_rays = 512
    origins = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * 20.0
    dirs = rng.standard_normal((n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o, d = vec(origins), vec(dirs)
    tmax = jnp.full((n_rays,), MISS_DIST)

    wide_hit = _traverse_wide(dbvh, o, d, tmax, any_hit=False)
    t_ref = brute_force_t(corners, origins, dirs)
    t_got = np.asarray(wide_hit.t)
    miss_ref = t_ref >= 1e30
    assert np.array_equal(miss_ref, t_got >= 1e30)
    assert np.allclose(t_got[~miss_ref], t_ref[~miss_ref], rtol=1e-4, atol=1e-5)

    occ_wide = np.asarray(_traverse_wide(dbvh, o, d, tmax, any_hit=True).slot >= 0)
    assert np.array_equal(occ_wide, ~miss_ref)


def test_traversal_slot_maps_to_hit_triangle(rng):
    corners = random_tris(rng, 300)
    bvh = build_bvh(corners, leaf_size=WIDE_LEAF)
    dbvh = to_device_bvh(bvh, corners)
    origins = np.zeros((64, 3), np.float32)
    dirs = rng.standard_normal((64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    hit = trace_closest(dbvh, vec(origins), vec(dirs))
    slot = np.asarray(hit.slot)
    ok = slot >= 0
    # The hit point recomputed from the slot triangle's plane lies on the ray.
    tv0 = np.stack([np.asarray(dbvh.tri_v0.x), np.asarray(dbvh.tri_v0.y), np.asarray(dbvh.tri_v0.z)], -1)
    te1 = np.stack([np.asarray(dbvh.tri_e1.x), np.asarray(dbvh.tri_e1.y), np.asarray(dbvh.tri_e1.z)], -1)
    te2 = np.stack([np.asarray(dbvh.tri_e2.x), np.asarray(dbvh.tri_e2.y), np.asarray(dbvh.tri_e2.z)], -1)
    for i in np.nonzero(ok)[0][:10]:
        s = slot[i]
        v0 = tv0[s]
        e1 = te1[s]
        e2 = te2[s]
        p_bary = v0 + float(hit.u[i]) * e1 + float(hit.v[i]) * e2
        p_ray = origins[i] + float(hit.t[i]) * dirs[i]
        assert np.allclose(p_bary, p_ray, atol=1e-3)


def test_occlusion(rng):
    # A single large triangle; rays toward/away from it.
    corners = np.array(
        [[[-10, -10, 5], [10, -10, 5], [0, 10, 5]]], dtype=np.float32
    )
    bvh = build_bvh(corners, leaf_size=WIDE_LEAF)
    dbvh = to_device_bvh(bvh, corners)
    origins = np.zeros((4, 3), np.float32)
    dirs = np.array(
        [[0, 0, 1], [0, 0, -1], [0, 0, 1], [1, 0, 0]], dtype=np.float32
    )
    tmax = np.array([10.0, 10.0, 2.0, 10.0], np.float32)
    occ = np.asarray(trace_occluded(dbvh, vec(origins), vec(dirs), jnp.asarray(tmax)))
    assert occ.tolist() == [True, False, False, False]


def test_occlusion_wide_respects_tmax(rng):
    corners = np.array(
        [[[-10, -10, 5], [10, -10, 5], [0, 10, 5]]], dtype=np.float32
    ).repeat(40, axis=0)
    corners += np.arange(40, dtype=np.float32)[:, None, None] * np.array(
        [0.0, 0.0, 1.0], np.float32
    )
    bvh = build_bvh(corners, leaf_size=4)
    dbvh = to_device_bvh(bvh, corners)
    origins = np.zeros((4, 3), np.float32)
    dirs = np.tile(np.array([[0, 0, 1.0]], np.float32), (4, 1))
    tmax = jnp.asarray(np.array([100.0, 4.9, 5.1, 0.5], np.float32))
    occ = np.asarray(
        _traverse_wide(dbvh, vec(origins), vec(dirs), tmax, any_hit=True).slot >= 0
    )
    assert occ.tolist() == [True, False, True, False]


def test_chunked_trace_matches(rng):
    corners = random_tris(rng, 300)
    bvh = build_bvh(corners, leaf_size=WIDE_LEAF)
    dbvh = to_device_bvh(bvh, corners)
    origins = (rng.random((128, 3)).astype(np.float32) - 0.5) * 20.0
    dirs = rng.standard_normal((128, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    h1 = trace_closest(dbvh, vec(origins), vec(dirs))
    h2 = trace_closest(dbvh, vec(origins), vec(dirs), chunk=32)
    assert np.allclose(np.asarray(h1.t), np.asarray(h2.t))
    assert np.array_equal(np.asarray(h1.slot), np.asarray(h2.slot))


def test_empty_bvh():
    bvh = build_bvh(np.zeros((0, 3, 3), np.float32), leaf_size=WIDE_LEAF)
    dbvh = to_device_bvh(bvh, np.zeros((0, 3, 3), np.float32))
    z = jnp.zeros((8,)); o = jnp.ones((8,))
    hit = trace_closest(dbvh, Vec3(z, z, z), Vec3(o, o, o))
    assert np.all(np.asarray(hit.slot) == -1)
    assert np.all(np.asarray(hit.t) >= 1e30)


def test_leaf_order_padding():
    corners = random_tris(np.random.default_rng(7), 40)
    bvh = build_bvh(corners, leaf_size=WIDE_LEAF)
    wide = collapse_bvh8(bvh)
    order = wide.tri_order
    used = order[order >= 0]
    assert sorted(used.tolist()) == list(range(40))
    assert len(order) % WIDE_LEAF == 0


def test_native_builder_matches_numpy(rng):
    from luminary_tpu.bvh.native import build_bvh_native, native_available

    if not native_available():
        pytest.skip("no native toolchain")
    corners = random_tris(rng, 500)
    bvh_n = build_bvh_native(corners, leaf_size=WIDE_LEAF)
    dbvh_n = to_device_bvh(bvh_n, corners)
    bvh_p = build_bvh(corners, leaf_size=WIDE_LEAF)
    dbvh_p = to_device_bvh(bvh_p, corners)

    origins = (rng.random((256, 3)).astype(np.float32) - 0.5) * 20.0
    dirs = rng.standard_normal((256, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    hn = trace_closest(dbvh_n, vec(origins), vec(dirs))
    hp = trace_closest(dbvh_p, vec(origins), vec(dirs))
    np.testing.assert_allclose(
        np.minimum(np.asarray(hn.t), 1e30),
        np.minimum(np.asarray(hp.t), 1e30),
        rtol=1e-4,
    )
    # all triangles present exactly once
    used = bvh_n.tri_order[bvh_n.tri_order >= 0]
    assert sorted(used.tolist()) == list(range(500))


def test_native_builder_large_scene_performance(rng):
    from luminary_tpu.bvh.native import build_bvh_native, native_available

    if not native_available():
        pytest.skip("no native toolchain")
    import time

    corners = random_tris(rng, 200_000, spread=100.0)
    t0 = time.monotonic()
    bvh = build_bvh_native(corners, leaf_size=WIDE_LEAF)
    dt = time.monotonic() - t0
    assert bvh is not None
    assert dt < 5.0, f"native build too slow: {dt:.2f}s for 200k tris"
    used = bvh.tri_order[bvh.tri_order >= 0]
    assert len(used) == 200_000


def test_collapse_depth_and_counts(rng):
    corners = random_tris(rng, 5000, spread=50.0)
    bvh = build_bvh(corners, leaf_size=WIDE_LEAF)
    wide = collapse_bvh8(bvh)
    assert wide.num_nodes >= 1
    assert 1 <= wide.depth <= 24
    used = wide.tri_order[wide.tri_order >= 0]
    assert sorted(used.tolist()) == list(range(5000))


def test_instance_move_refits_not_rebuilds():
    """INSTANCE-only edits refit the cached topology (reference: IAS update
    with GAS cache): fast, and hits land on the moved geometry."""
    import time

    import jax.numpy as jnp
    import numpy as np

    from luminary_tpu.ops.traverse import trace_closest
    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.testing import benchmark_scene

    scene = benchmark_scene(32, 32, max_depth=2, nx=5, nz=5)
    r = Renderer(scene, chunk=1 << 20)
    assert r._bvh_topo is not None
    n_tris = int((r._bvh_topo.tri_order >= 0).sum())

    inst = scene.get_instance(0)
    inst.position = (3.0, 0.5, -2.0)
    scene.set_instance(inst)
    t0 = time.monotonic()
    r.update()
    dt = time.monotonic() - t0
    # same topology object reused, same triangle count
    assert int((r._bvh_topo.tri_order >= 0).sum()) == n_tris
    # refit pack must be fast (full SAH rebuild of 9k tris is much slower);
    # generous bound for contended CI
    assert dt < 5.0, dt

    # a ray at the MOVED ground plane position must hit it
    bvh = r.device_scene.geo.bvh
    o = Vec3(jnp.asarray([3.0 + 6.0]), jnp.asarray([5.0]), jnp.asarray([-2.0 + 6.0]))
    d = Vec3(jnp.asarray([0.0]), jnp.asarray([-1.0]), jnp.asarray([0.0]))
    hit = trace_closest(bvh, o, d)
    assert bool(hit.valid[0])
    t_exp = 5.0 - 0.5  # plane was at y=0, moved up by 0.5
    assert abs(float(hit.t[0]) - t_exp) < 0.2, float(hit.t[0])
