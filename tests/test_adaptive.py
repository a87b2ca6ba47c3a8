"""Adaptive sampling tests (reference: device_adaptive_sampler.c behavior)."""

import numpy as np
import jax.numpy as jnp
import pytest

from luminary_tpu.render.adaptive import (
    BLOCK,
    block_error_map,
    pick_stage_pixels,
)
from luminary_tpu.render.renderer import Renderer
from luminary_tpu.testing import cornell_scene


def test_block_error_map_flags_noisy_region():
    w = h = 16
    n = w * h
    rad = np.full((n, 3), 1.0, np.float32)  # per-sample lum = 0.25
    lsq = np.full((n,), 0.25, np.float32)  # 4 x 0.25² → zero variance
    cnt = np.full((n,), 4, np.int32)
    # make block (1,1) noisy: big second moment
    ys, xs = np.meshgrid(range(4, 8), range(4, 8), indexing="ij")
    noisy = (ys * w + xs).reshape(-1)
    lsq[noisy] = 25.0
    err = np.asarray(
        block_error_map(jnp.asarray(rad), jnp.asarray(lsq), jnp.asarray(cnt),
                        w, h, False)
    )
    assert err.shape == (4, 4)
    assert err[1, 1] > 10 * (err[0, 0] + 1e-9)


def test_pick_stage_pixels_targets_noisy_blocks():
    err = np.zeros((4, 4), np.float32)
    err[2, 3] = 1.0
    err[0, 1] = 0.5
    pix = pick_stage_pixels(err, 16, 16, budget_pixels=32)
    assert pix is not None and len(pix) == 32
    ys, xs = np.divmod(pix, 16)
    blocks = set(zip((ys // BLOCK).tolist(), (xs // BLOCK).tolist()))
    assert blocks == {(2, 3), (0, 1)}


def test_pick_returns_none_when_converged():
    err = np.zeros((4, 4), np.float32)
    assert pick_stage_pixels(err, 16, 16, 32) is None


def test_adaptive_render_end_to_end():
    scene = cornell_scene(16, 16, max_depth=3)
    st = scene.get_entity("settings")
    st.enable_adaptive_sampling = True
    st.adaptive_sampling_avg_sampling_rate = 2
    st.adaptive_sampling_update_interval = 16
    scene.set_entity("settings", st)
    r = Renderer(scene, chunk=256)
    r.render_samples(8)
    counts = np.asarray(r.accum.sample_count)[: 16 * 16]
    assert counts.min() >= 2  # baseline coverage everywhere
    assert counts.max() > counts.min()  # extra samples somewhere
    # budget conservation: total lane-samples ≈ requested budget
    assert counts.sum() >= 8 * 16 * 16 * 0.8
    rad = r.get_radiance()
    assert np.all(np.isfinite(rad)) and rad.mean() > 0.01


def test_adaptive_matches_uniform_mean():
    """Adaptive estimates stay unbiased: means agree with uniform rendering
    within noise."""
    scene_u = cornell_scene(12, 12, max_depth=2)
    ru = Renderer(scene_u, chunk=144)
    ru.render_samples(96)
    scene_a = cornell_scene(12, 12, max_depth=2)
    st = scene_a.get_entity("settings")
    st.enable_adaptive_sampling = True
    st.adaptive_sampling_avg_sampling_rate = 4
    scene_a.set_entity("settings", st)
    ra = Renderer(scene_a, chunk=144)
    ra.render_samples(96)
    mu = ru.get_radiance().mean()
    ma = ra.get_radiance().mean()
    assert abs(mu - ma) / mu < 0.15, (mu, ma)


def test_allocate_stage_tasks_proportional():
    from luminary_tpu.render.adaptive import allocate_stage_tasks

    err = np.zeros((4, 4), np.float64)
    err[0, 0] = 0.4
    err[1, 1] = 0.1
    err[2, 2] = 0.1
    pix, rank = allocate_stage_tasks(err, 16, 16, avg_rate=2, max_rate=8)
    assert pix is not None
    # all-block avg (reference semantics) = 0.6/16 = 0.0375 →
    # counts = round(err/avg * 2) = [21→clamp 8, 5, 5]
    ys, xs = np.divmod(pix, 16)
    blocks = list(zip((ys // BLOCK).tolist(), (xs // BLOCK).tolist()))
    from collections import Counter
    c = Counter(blocks)
    assert c[(0, 0)] == 8 * BLOCK * BLOCK
    assert c[(1, 1)] == 5 * BLOCK * BLOCK
    assert c[(2, 2)] == 5 * BLOCK * BLOCK
    assert set(c) == {(0, 0), (1, 1), (2, 2)}  # converged blocks excluded
    # ranks: each pixel's occurrences carry distinct 0..count-1 ranks
    for p in np.unique(pix[:32]):
        rs = sorted(rank[pix == p].tolist())
        assert rs == list(range(len(rs)))


def test_allocate_stage_tasks_clamps_and_budget():
    from luminary_tpu.render.adaptive import allocate_stage_tasks

    err = np.full((2, 2), 1e-6)
    err[0, 0] = 100.0  # would want a huge count — clamped to max_rate
    pix, rank = allocate_stage_tasks(err, 8, 8, avg_rate=2, max_rate=8)
    assert rank.max() == 7  # max_rate clamp
    # budget truncation keeps the highest-error block only
    err2 = np.array([[1.0, 0.5], [0.25, 0.125]])
    pix2, _ = allocate_stage_tasks(
        err2, 8, 8, avg_rate=1, max_rate=8, budget_tasks=16)
    ys, xs = np.divmod(pix2, 8)
    assert set(zip((ys // BLOCK).tolist(), (xs // BLOCK).tolist())) == {(0, 0)}
    # fully converged → None
    assert allocate_stage_tasks(
        np.zeros((2, 2)), 8, 8, avg_rate=2)[0] is None
