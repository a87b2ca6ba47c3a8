"""Planar row-handout helpers (ops/rowops.py): CPU-path equivalence of
planar/unplanar/gather_planar/gather_packed_planar against plain numpy.
On TPU these lower to one-pass Pallas block kernels; the CPU fallback is
`.T`/where-chains with identical results, so these gates pin the
numerics the TPU kernels must (and do — see the on-chip agreement checks
in the traversal commits) reproduce."""

import numpy as np
import jax
import jax.numpy as jnp

from luminary_tpu.ops.rowops import (
    gather_packed_planar,
    gather_planar,
    planar,
    unplanar,
)
from luminary_tpu.render.device_scene import SHP_SUB, _pack8


def test_planar_roundtrip(rng):
    a = jnp.asarray(rng.standard_normal((1024, 37)).astype(np.float32))
    p = planar(a)
    assert p.shape == (37, 1024)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(a).T)
    np.testing.assert_array_equal(np.asarray(unplanar(p)), np.asarray(a))


def test_gather_planar_matches_numpy(rng):
    table = jnp.asarray(rng.standard_normal((5000, 18)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 5000, 768).astype(np.int32))
    out = np.asarray(jax.jit(gather_planar)(table, idx))
    ref = np.asarray(table)[np.asarray(idx)].T
    np.testing.assert_array_equal(out, ref)


def test_gather_packed_planar_selects_sub_slot(rng):
    p = 999  # non-multiple of 8: exercises row padding
    n_cols = 16
    cols = {c: rng.integers(-2**31, 2**31 - 1, p).astype(np.int64)
            .astype(np.int32) for c in range(14)}
    table = jnp.asarray(_pack8(cols, p, n_cols))
    assert table.shape == ((p + SHP_SUB - 1) // SHP_SUB, n_cols * SHP_SUB)
    slot = jnp.asarray(rng.integers(0, p, 512).astype(np.int32))
    out = np.asarray(
        jax.jit(lambda t, s: gather_packed_planar(t, s, n_cols))(table, slot))
    for c in range(14):
        np.testing.assert_array_equal(out[c], cols[c][np.asarray(slot)])
