"""Dimension-allocated quasi/pseudo random sampling.

The reference allocates one QMC dimension per sampling decision via a
``RandomTarget`` enum and generates numbers from scrambled Sobol / R-sequences
/ blue noise keyed on (pixel, sample_id, depth, target)
(reference: src/luminary/device/cuda/random.cuh:24-66, 171-280).

We keep the same *allocation discipline* — every stochastic decision in the
integrator draws from its own target dimension, which decorrelates dimensions
and is what actually drives convergence — with two generator backends:

  * ``uniform``: counter-based hash (murmur3-style finalizer over the packed
    key), the default. Stateless, order-independent, TPU-vector friendly.
  * ``quasi``: scrambled-Sobol-like (0,2)-sequence via radical inverses with
    per-dimension Owen-style hash scrambling for the first two dims of each
    target pair — used for the camera jitter / lens / BSDF dims where
    stratification pays the most.
"""

from __future__ import annotations

from enum import IntEnum

import jax.numpy as jnp
import numpy as np


class RandomTarget(IntEnum):
    """One dimension per sampling decision (per depth where noted).

    Mirrors the allocation discipline of reference random.cuh:24-66 (names
    match where the decision exists in our integrator).
    """

    CAMERA_JITTER = 0
    LENS = 1
    LENS_BLADE = 2
    BSDF_REFLECTION = 3
    BSDF_REFRACTION = 4
    BSDF_CHOICE = 5
    RUSSIAN_ROULETTE = 6
    LIGHT_TREE = 7
    LIGHT_TRIANGLE = 8
    LIGHT_SUN = 9
    LIGHT_AMBIENT = 10
    LIGHT_RIS = 11
    VOLUME_DISTANCE = 12
    VOLUME_PHASE = 13
    BRIDGE_VERTEX_COUNT = 14
    BRIDGE_PHASE = 15
    BRIDGE_DISTANCE = 16
    OCEAN_CAUSTICS = 17
    PARTICLE_PHASE = 18
    WAVELENGTH = 19
    DITHER = 20
    ADAPTIVE = 21
    MICROTRIANGLE = 22
    EMISSION_INDEX = 23
    LIGHT_TREE_LEVEL = 24
    ALPHA_TEST = 25

    NUM_TARGETS = 26


# numpy (not jnp): a device constant here would force jax backend init at
# import time, breaking light-weight imports of the io/scene subpackages.
_DEPTH_STRIDE = np.uint32(RandomTarget.NUM_TARGETS)


def _mix(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32 finalizer — full-avalanche 32-bit mixer."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def _key(target, pixel_id, sample_id, depth) -> jnp.ndarray:
    """Combine the 4-part key into well-mixed 32-bit state.

    Two mixer rounds total: u32 multiplies are the expensive op on the TPU
    VPU, and two murmur-style rounds already pass the avalanche bar for
    rendering use (the reference's Squares-style hash is similarly shallow,
    random.cuh:171-195)."""
    t = jnp.uint32(int(target)) + _DEPTH_STRIDE * jnp.asarray(depth, jnp.uint32)
    h = jnp.asarray(pixel_id, jnp.uint32) ^ (
        jnp.asarray(sample_id, jnp.uint32) * jnp.uint32(0x85EBCA6B)
    )
    h = h + t * jnp.uint32(0xC2B2AE35)
    return _mix(h ^ (h >> 15))


def _to_float(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 → float32 in [0, 1)."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def random_1d(target, pixel_id, sample_id, depth=0) -> jnp.ndarray:
    """One uniform float in [0,1) per element of pixel_id."""
    return _to_float(_key(target, pixel_id, sample_id, depth))


def random_2d(target, pixel_id, sample_id, depth=0) -> jnp.ndarray:
    """[..., 2] uniform floats; second dim decorrelated by one extra round."""
    h = _key(target, pixel_id, sample_id, depth)
    h2 = (h ^ jnp.uint32(0x68BC21EB)) * jnp.uint32(0x846CA68B)
    h2 ^= h2 >> 16
    return jnp.stack([_to_float(h), _to_float(h2)], axis=-1)


# ---------------------------------------------------------------------------
# Stratified (0,2)-sequence for the camera/lens dims
# ---------------------------------------------------------------------------


def _reverse_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32)
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x & jnp.uint32(0xAAAAAAAA)) >> 1)
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x & jnp.uint32(0xCCCCCCCC)) >> 2)
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x & jnp.uint32(0xF0F0F0F0)) >> 4)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x & jnp.uint32(0xFF00FF00)) >> 8)
    return (x << 16) | (x >> 16)


def _sobol_dim2(index: jnp.ndarray) -> jnp.ndarray:
    """Second dimension of the Sobol (0,2)-sequence (direction numbers for
    the y component of the standard 2D Sobol table)."""
    index = index.astype(jnp.uint32)
    v = jnp.uint32(1 << 31)
    result = jnp.zeros_like(index)
    # Unrolled 32-step loop: classic Sobol dim-2 recurrence v_{k+1} = v_k ^ (v_k >> 1)
    for _ in range(32):
        result = jnp.where((index & 1) != 0, result ^ v, result)
        index = index >> 1
        v = v ^ (v >> 1)
    return result


def _laine_karras(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Hash-based per-digit permutation, LSB-avalanche-upward form."""
    x = x + seed
    x ^= x * jnp.uint32(0x6C50B47C)
    x ^= x * jnp.uint32(0xB82F1E52)
    x ^= x * jnp.uint32(0xC7AFE638)
    x ^= x * jnp.uint32(0x8D22F6E6)
    return x


def _nested_uniform_scramble(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Owen scrambling of the MSB-first digit tree via the LK permutation."""
    return _reverse_bits(_laine_karras(_reverse_bits(x), seed))


def quasi_2d(target, pixel_id, sample_id, depth=0) -> jnp.ndarray:
    """Owen-scrambled Sobol (0,2) point, decorrelated per pixel/target.

    Stratifies over sample_id — the convergence-critical dims (camera jitter,
    lens, BSDF) should use this (reference random.cuh uses scrambled Sobol
    the same way). Construction follows the standard shuffled-scrambled-Sobol
    recipe: shuffle the index with one Owen scramble, then Owen-scramble each
    dimension's output digits with independent seeds.
    """
    idx = jnp.asarray(sample_id, jnp.uint32)
    salt = _key(target, pixel_id, jnp.zeros_like(idx), depth)
    shuffled = _nested_uniform_scramble(idx, _mix(salt))
    x = _reverse_bits(shuffled)  # Sobol dim 1 = van der Corput
    y = _sobol_dim2(shuffled)
    x = _nested_uniform_scramble(x, _mix(salt ^ jnp.uint32(0x1D8E4464)))
    y = _nested_uniform_scramble(y, _mix(salt ^ jnp.uint32(0x58F482D5)))
    return jnp.stack([_to_float(x), _to_float(y)], axis=-1)
