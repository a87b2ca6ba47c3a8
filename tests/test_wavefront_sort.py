"""Wavefront sorting (tasks_sort analog) must not change the image.

Sorting only permutes lanes between depths; every lane carries its RNG keys
(pixel_id, sample_id) with it, so per-pixel radiance must match the unsorted
render to float tolerance.
"""

import numpy as np

from luminary_tpu.testing import benchmark_scene


def _render(sort: bool, samples=2):
    from luminary_tpu.render.renderer import Renderer

    scene = benchmark_scene(width=64, height=48, max_depth=3, nx=4, nz=4)
    r = Renderer(scene, chunk=1 << 20)
    assert int(r.device_scene.geo.bvh.tri_v0.x.shape[0]) > 128, "need tree tier"
    r.config = r.config._replace(sort_wavefront=sort)
    r.render_samples(samples)
    return np.asarray(r.accum.radiance) / np.asarray(r.accum.sample_count)[:, None]


def test_sorted_wavefront_matches_unsorted():
    a = _render(sort=False)
    b = _render(sort=True)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_ray_sort_key_groups_dead_lanes_last():
    import jax.numpy as jnp

    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.ops.wavefront_utils import ray_sort_key

    n = 64
    rng = np.random.default_rng(0)
    o = Vec3(*(jnp.asarray(rng.uniform(0, 1, n).astype(np.float32)) for _ in range(3)))
    d = Vec3(*(jnp.asarray(rng.normal(size=n).astype(np.float32)) for _ in range(3)))
    act = jnp.asarray(rng.random(n) < 0.5)
    key = ray_sort_key(o, d, act, jnp.asarray([0, 0, 0, 1, 1, 1], jnp.float32))
    order = np.argsort(np.asarray(key), kind="stable")
    live_sorted = np.asarray(act)[order]
    # all live lanes precede all dead lanes
    first_dead = np.argmax(~live_sorted) if (~live_sorted).any() else n
    assert not live_sorted[first_dead:].any()
