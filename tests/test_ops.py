"""Unit tests for device ops: RNG distributions, camera, tonemaps, math."""

import jax.numpy as jnp
import numpy as np
import pytest

from luminary_tpu.ops import math3
from luminary_tpu.ops.random import (
    RandomTarget,
    quasi_2d,
    random_1d,
    random_2d,
)
from luminary_tpu.ops.tonemap import (
    apply_filter,
    apply_tonemap,
    linear_to_srgb,
)


def test_random_uniform_range_and_mean():
    pid = jnp.arange(4096, dtype=jnp.uint32)
    r = np.asarray(random_1d(RandomTarget.BSDF_REFLECTION, pid, 7, 3))
    assert r.min() >= 0.0 and r.max() < 1.0
    assert abs(r.mean() - 0.5) < 0.02
    # decorrelated across targets
    r2 = np.asarray(random_1d(RandomTarget.LIGHT_SUN, pid, 7, 3))
    assert abs(np.corrcoef(r, r2)[0, 1]) < 0.05


def test_random_2d_dims_decorrelated():
    pid = jnp.arange(4096, dtype=jnp.uint32)
    r = np.asarray(random_2d(RandomTarget.LENS, pid, 0))
    assert abs(np.corrcoef(r[:, 0], r[:, 1])[0, 1]) < 0.05


def test_quasi_2d_stratification():
    """Owen-scrambled Sobol: 256 samples of one pixel should cover a 16x16
    grid far more evenly than iid uniforms."""
    pid = jnp.zeros((256,), jnp.uint32)
    sid = jnp.arange(256, dtype=jnp.uint32)
    pts = np.asarray(quasi_2d(RandomTarget.CAMERA_JITTER, pid, sid))
    cells = set()
    for x, y in pts:
        cells.add((int(x * 16), int(y * 16)))
    # perfect (0,2)-sequence hits all 256 cells; allow minor slack
    assert len(cells) >= 250, f"poor stratification: {len(cells)}/256 cells"


def test_quasi_2d_differs_per_pixel():
    sid = jnp.arange(64, dtype=jnp.uint32)
    a = np.asarray(quasi_2d(RandomTarget.CAMERA_JITTER, jnp.zeros(64, jnp.uint32), sid))
    b = np.asarray(quasi_2d(RandomTarget.CAMERA_JITTER, jnp.ones(64, jnp.uint32), sid))
    assert not np.allclose(a, b)


def test_cosine_hemisphere_distribution():
    """Diffuse-lobe sampling inside material_sample is cosine-weighted:
    E[cos θ] = 2/3 for pdf = cos/π."""
    from luminary_tpu.ops.material import make_frame, material_sample
    from luminary_tpu.ops.vec import Vec3
    from tests.test_ggx import make_mat, vec_tile

    n = 8192
    mat = make_mat(n, albedo=(1.0, 1.0, 1.0), roughness=1.0, metallic=0.0)
    ns = vec_tile((0.0, 0.0, 1.0), n)
    wo = vec_tile((0.0, 0.0, 1.0), n)
    pid = jnp.arange(n, dtype=jnp.uint32)
    fr = make_frame(mat, ns, wo)
    # force the diffuse lobe by using lanes where the spec draw is unlikely:
    wi, weight, pdf, is_delta, _ = material_sample(mat, fr, ns, wo, pid, 0, 0)
    z = np.asarray(wi.z)
    assert np.all(z > -1e-5)
    # mean cosine dominated by the diffuse lobe (spec prob is clipped at 5%)
    assert abs(z.mean() - 2.0 / 3.0) < 0.05


def test_orthonormal_basis():
    rng = np.random.default_rng(3)
    n = rng.standard_normal((256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = math3.orthonormal_basis(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    assert np.allclose((t * n).sum(-1), 0, atol=1e-5)
    assert np.allclose((b * n).sum(-1), 0, atol=1e-5)
    assert np.allclose((t * b).sum(-1), 0, atol=1e-5)
    assert np.allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)


def test_quaternion_matches_euler_convention():
    # yaw pi/2 about z: +x -> +y (intrinsic ZYX / roll-pitch-yaw convention)
    q = math3.quaternion_from_euler(jnp.asarray([0.0, 0.0, np.pi / 2]))
    v = math3.quaternion_apply(q, jnp.asarray([1.0, 0.0, 0.0]))
    assert np.allclose(np.asarray(v), [0, 1, 0], atol=1e-6)
    # pitch pi/2 about y: +z -> +x
    q = math3.quaternion_from_euler(jnp.asarray([0.0, np.pi / 2, 0.0]))
    v = math3.quaternion_apply(q, jnp.asarray([0.0, 0.0, 1.0]))
    assert np.allclose(np.asarray(v), [1, 0, 0], atol=1e-6)


@pytest.mark.parametrize("tm", [0, 1, 2, 3, 4, 5, 6])
def test_tonemaps_bounded(tm):
    x = jnp.asarray(
        np.random.default_rng(1).random((64, 3)).astype(np.float32) * 20.0
    )
    y = np.asarray(apply_tonemap(x, tm))
    assert np.all(np.isfinite(y))
    assert y.min() >= 0.0 and y.max() <= 1.0 + 1e-6
    # monotone-ish: black maps to (near) black
    y0 = np.asarray(apply_tonemap(jnp.zeros((1, 3)), tm))
    assert y0.max() < 0.08


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4, 6])
def test_filters_bounded(f):
    x = jnp.asarray(np.random.default_rng(2).random((64, 3)).astype(np.float32))
    y = np.asarray(apply_filter(x, f))
    assert y.shape == (64, 3)
    assert np.all(np.isfinite(y)) and y.min() >= 0.0 and y.max() <= 1.0 + 1e-6


def test_srgb_roundtrip_endpoints():
    x = jnp.asarray([0.0, 1.0, 0.5])
    y = np.asarray(linear_to_srgb(x))
    assert abs(y[0]) < 1e-6 and abs(y[1] - 1.0) < 1e-6
    assert 0.7 < y[2] < 0.76  # sRGB(0.5) ≈ 0.7354
