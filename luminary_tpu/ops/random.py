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

import os
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


def random_1d(target, pixel_id, sample_id, depth=0, bn=None) -> jnp.ndarray:
    """One uniform float in [0,1) per element of pixel_id.

    bn: optional (bx, by) uint32 blue-noise pair from blue_base() — switches
    the draw to the reference's Sobol + blue-noise Cranley-Patterson
    construction (random.cuh random_2D_base); pixel_id is then unused.
    """
    if bn is not None:
        return _blue_sobol(target, sample_id, depth, bn)[..., 0]
    return _to_float(_key(target, pixel_id, sample_id, depth))


def random_2d(target, pixel_id, sample_id, depth=0, bn=None) -> jnp.ndarray:
    """[..., 2] uniform floats; second dim decorrelated by one extra round.

    bn: see random_1d.
    """
    if bn is not None:
        return _blue_sobol(target, sample_id, depth, bn)
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


# ---------------------------------------------------------------------------
# Blue-noise Cranley-Patterson rotation (reference: random.cuh
# random_2D_base — every draw is a pixel-INDEPENDENT scrambled-Sobol point
# plus a per-pixel blue-noise shift; pixel decorrelation comes entirely from
# the mask, which makes the per-pixel ERROR field blue instead of white).
# ---------------------------------------------------------------------------

# R2 Kronecker constants in u32 fixed point (random.cuh R2_PHI1/R2_PHI2).
_R2_PHI1 = np.uint32(3242174889)
_R2_PHI2 = np.uint32(2447445413)

_BN_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "data", "bluenoise_128.npy"
)
_BN_CACHE = None
BN_CHANNELS = 16


def load_bluenoise() -> np.ndarray:
    """[16, 128, 128] uint32 fixed-point blue-noise rank masks (host numpy;
    generated by tools/gen_bluenoise.py — void-and-cluster, the same family
    as the reference's embedded masks, device_embedded.h bluenoise).
    16 INDEPENDENT channels: per-dimension decorrelation needs distinct mask
    data — measured: value-rotating one shared mask leaves |corr| up to 0.44
    between dimensions, and toroidal shears whiten the spectrum entirely."""
    global _BN_CACHE
    if _BN_CACHE is None:
        f = np.load(_BN_PATH)  # [C, 128, 128] f32 in [0,1)
        _BN_CACHE = (f * np.float32(2.0**32)).astype(np.int64).astype(np.uint32)
    return _BN_CACHE


def blue_base(pixel_x, pixel_y):
    """Per-lane uint32 mask values for this pixel: a tuple of C [N] arrays.

    ONE [16384, C] row gather per SAMPLE (computed once at task creation;
    every draw then picks its channels STATICALLY, costing pure
    arithmetic). Gathers cost per INDEX on TPU with row width nearly free,
    so all C channels ride one row — C separate flat gathers measured
    ~230 ms/sample at 2M lanes (round-4 profile). The reference instead
    re-reads one mask with per-dimension COORDINATE offsets
    (random.cuh:308-312) — a gather per draw, free on GPU texture caches
    but not on TPU."""
    mask = load_bluenoise()
    rows = jnp.asarray(
        np.ascontiguousarray(mask.reshape(mask.shape[0], -1).T)
    )  # [16384, C]
    idx = (
        (jnp.asarray(pixel_y, jnp.uint32) & jnp.uint32(127)) * jnp.uint32(128)
        + (jnp.asarray(pixel_x, jnp.uint32) & jnp.uint32(127))
    ).astype(jnp.int32)
    r = rows[idx]  # [N, C] — the one gather
    return tuple(r[:, c] for c in range(mask.shape[0]))


# Static channel-pair assignment. Targets drawn at the SAME vertex on the
# same lanes must not share a channel (their error patterns would align);
# targets on disjoint lanes or disjoint pipeline stages may. Unlisted
# targets derive a pair from their index.
_BN_ASSIGN = {
    RandomTarget.BSDF_CHOICE: (0, 1),
    RandomTarget.BSDF_REFLECTION: (1, 2),
    RandomTarget.BSDF_REFRACTION: (2, 3),
    RandomTarget.LIGHT_RIS: (3, 4),
    RandomTarget.LIGHT_TREE: (4, 5),
    RandomTarget.LIGHT_TRIANGLE: (6, 7),
    RandomTarget.LIGHT_SUN: (8, 9),
    RandomTarget.LIGHT_AMBIENT: (10, 11),
    RandomTarget.RUSSIAN_ROULETTE: (12, 13),
    RandomTarget.ALPHA_TEST: (13, 14),
    RandomTarget.EMISSION_INDEX: (14, 15),
    RandomTarget.LIGHT_TREE_LEVEL: (15, 0),
    # camera-stage targets never co-occur with the depth>=2-only ones
    RandomTarget.LENS: (12, 13),
    RandomTarget.LENS_BLADE: (14, 15),
    RandomTarget.WAVELENGTH: (5, 6),
    # volume/particle lanes are disjoint from surface-BSDF lanes
    RandomTarget.VOLUME_PHASE: (7, 8),
    RandomTarget.PARTICLE_PHASE: (9, 10),
    RandomTarget.VOLUME_DISTANCE: (11, 12),
}


def _bn_pick(target, depth):
    """Static (channel_x, channel_y) for a draw; depth hops by 7 (coprime to
    16) so consecutive bounces of one target decorrelate too."""
    cx, cy = _BN_ASSIGN.get(
        RandomTarget(int(target)) if int(target) < int(RandomTarget.NUM_TARGETS)
        else -1,
        (int(target) * 2 % BN_CHANNELS, (int(target) * 2 + 9) % BN_CHANNELS),
    )
    d = int(depth)
    return (cx + 7 * d) % BN_CHANNELS, (cy + 7 * d) % BN_CHANNELS


def _blue_sobol(target, sample_id, depth, bn) -> jnp.ndarray:
    """Owen-scrambled Sobol (0,2) point shared by ALL pixels of a sample
    (seeded by the dimension index only) + per-pixel blue-noise shift from
    this dimension's own mask channel (u32 adds wrap = exact mod-1 toroidal
    shift). Uniform marginals are preserved exactly, so every estimator
    stays unbiased. `depth` must be a static python int (it selects the
    channel at trace time)."""
    cx, cy = _bn_pick(target, depth)
    bx, by = bn[cx], bn[cy]
    dim = jnp.uint32(int(target) + int(_DEPTH_STRIDE) * int(depth))
    salt = _mix(dim * jnp.uint32(0x9E3779B9) + jnp.uint32(0xFCBD6E15))
    idx = jnp.asarray(sample_id, jnp.uint32)
    shuffled = _nested_uniform_scramble(idx, _mix(salt))
    x = _reverse_bits(shuffled)
    y = _sobol_dim2(shuffled)
    x = _nested_uniform_scramble(x, _mix(salt ^ jnp.uint32(0x1D8E4464)))
    y = _nested_uniform_scramble(y, _mix(salt ^ jnp.uint32(0x58F482D5)))
    # R2 value rotation on top: same-channel collisions (hash overflow /
    # depth hops) land rotated rather than identical
    rot = dim + jnp.uint32(1)
    x = x + bx + rot * jnp.asarray(_R2_PHI1)
    y = y + by + rot * jnp.asarray(_R2_PHI2)
    return jnp.stack([_to_float(x), _to_float(y)], axis=-1)


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
