"""Generate the blue-noise rank masks shipped in data/bluenoise_128.npy.

Void-and-cluster (Ulichney 1993), the same construction behind the
reference's embedded blue-noise textures (reference: device_embedded.h:6-17
bluenoise 1D/2D entries; consumed by cuda/random.cuh:7). Two independent
128x128 channels are produced — one per dimension of a 2D sample — each a
full rank permutation scaled to [0,1).

Energy field: toroidal Gaussian (sigma = 1.9 px, the standard choice).
Incremental updates (add/subtract one shifted kernel per step) keep the
whole build O(n^2) ~ seconds for n = 128^2 per channel.

Run from the repo root:  python tools/gen_bluenoise.py
"""

from __future__ import annotations

import os

import numpy as np

RES = 128
SIGMA = 1.9


def _kernel(res: int, sigma: float) -> np.ndarray:
    """Toroidal Gaussian energy kernel centered at (0, 0)."""
    d = np.arange(res, dtype=np.float64)
    d = np.minimum(d, res - d)  # wrapped distance per axis
    d2 = d[:, None] ** 2 + d[None, :] ** 2
    k = np.exp(-d2 / (2.0 * sigma * sigma))
    k[0, 0] = 0.0  # a point is not its own neighbor
    return k


def _roll2(k: np.ndarray, y: int, x: int) -> np.ndarray:
    return np.roll(np.roll(k, y, axis=0), x, axis=1)


def _tightest(energy: np.ndarray, mask: np.ndarray) -> tuple[int, int]:
    e = np.where(mask, energy, -np.inf)
    i = int(np.argmax(e))
    return i // energy.shape[1], i % energy.shape[1]


def _largest_void(energy: np.ndarray, mask: np.ndarray) -> tuple[int, int]:
    e = np.where(mask, np.inf, energy)
    i = int(np.argmin(e))
    return i // energy.shape[1], i % energy.shape[1]


def build_mask(res: int = RES, sigma: float = SIGMA, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = res * res
    kern = _kernel(res, sigma)

    # --- initial binary pattern: 10% ones, relaxed ---
    ones = max(n // 10, 1)
    mask = np.zeros((res, res), bool)
    idx = rng.choice(n, ones, replace=False)
    mask[idx // res, idx % res] = True
    energy = np.zeros((res, res))
    for y, x in zip(*np.nonzero(mask)):
        energy += _roll2(kern, y, x)
    # swap tightest cluster into largest void until it would undo itself
    for _ in range(n):
        cy, cx = _tightest(energy, mask)
        mask[cy, cx] = False
        energy -= _roll2(kern, cy, cx)
        vy, vx = _largest_void(energy, mask)
        mask[vy, vx] = True
        energy += _roll2(kern, vy, vx)
        if (vy, vx) == (cy, cx):
            break

    rank = np.zeros((res, res), np.int64)

    # --- phase 1: rank the initial ones by removing tightest clusters ---
    m1 = mask.copy()
    e1 = energy.copy()
    for r in range(ones - 1, -1, -1):
        cy, cx = _tightest(e1, m1)
        m1[cy, cx] = False
        e1 -= _roll2(kern, cy, cx)
        rank[cy, cx] = r

    # --- phase 2 (+3): fill the voids in order ---
    m2 = mask.copy()
    e2 = energy.copy()
    for r in range(ones, n):
        vy, vx = _largest_void(e2, m2)
        m2[vy, vx] = True
        e2 += _roll2(kern, vy, vx)
        rank[vy, vx] = r

    return ((rank.astype(np.float64) + 0.5) / n).astype(np.float32)


NUM_CHANNELS = 16  # independent channels; ops/random.py assigns them to
# RandomTargets statically so interacting dims never share a mask


def main() -> None:
    out = os.path.join(os.path.dirname(__file__), "..", "data",
                       "bluenoise_128.npy")
    chans = []
    for s in range(NUM_CHANNELS):
        chans.append(build_mask(seed=s))
        print(f"channel {s} done")
    arr = np.stack(chans)  # [NUM_CHANNELS, RES, RES]
    np.save(out, arr)
    print("wrote", out, arr.shape, arr.dtype)


if __name__ == "__main__":
    main()
