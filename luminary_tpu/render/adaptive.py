"""Adaptive sampling: variance-driven per-block sample allocation.

Reference: src/luminary/device/device_adaptive_sampler.c + cuda/
adaptive_sampling.cuh — per-4x4-block relative variance drives up to 4 stages
of extra samples, exposure-aware, with device-side prefix sums feeding task
creation. The TPU translation: the error reduction is one jitted dense pass
over the moment buffers; stage wavefronts are just new (px, py) index arrays
built on host from the block picks (the wavefront is already an arbitrary
pixel list), and per-lane sample ids let every pixel continue its own QMC
sequence. A stage's accumulation lands in subset-shaped buffers and is
scatter-added into the frame accumulators once per stage.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 4  # reference: 4x4 blocks
NUM_STAGES = 4  # reference: ADAPTIVE_SAMPLER_NUM_STAGES


@partial(jax.jit, static_argnames=("width", "height", "exposure_aware"))
def block_error_map(
    radiance_sum, lum_sq_sum, sample_count, width: int, height: int,
    exposure_aware: bool, exposure=1.0,
):
    """[H/4, W/4] relative standard-error per block.

    error = sqrt(Var[mean]) / (mean + eps), optionally compressed by the
    tonemap slope (reference: adaptive_sampling.cuh:9-17 exposure-aware
    compression — bright pixels tolerate more absolute noise).
    """
    n_pix = width * height
    lum = (
        0.2126 * radiance_sum[:n_pix, 0]
        + 0.7152 * radiance_sum[:n_pix, 1]
        + 0.0722 * radiance_sum[:n_pix, 2]
    )
    cnt = jnp.maximum(sample_count[:n_pix].astype(jnp.float32), 1.0)
    mean = lum / cnt
    # Var[X] = E[X²] - E[X]²; Var[mean] = Var[X]/n
    ex2 = lum_sq_sum[:n_pix] / cnt
    var = jnp.maximum(ex2 - mean * mean, 0.0) / cnt
    err = jnp.sqrt(var)
    if exposure_aware:
        # tonemap-slope compression: d(tm)/dx of x/(1+x) = 1/(1+x)^2
        scale = 1.0 / jnp.square(1.0 + mean * exposure)
        err = err * scale * exposure
    else:
        err = err / (mean + 1e-2)

    hb, wb = height // BLOCK, width // BLOCK
    err_img = err.reshape(height, width)
    blocks = err_img[: hb * BLOCK, : wb * BLOCK].reshape(hb, BLOCK, wb, BLOCK)
    return blocks.max(axis=(1, 3))


@partial(jax.jit, donate_argnums=(0, 1, 2))
def scatter_add_stage(radiance_sum, lum_sq_sum, sample_count, idx,
                      stage_radiance, stage_lum_sq, stage_count):
    """Fold a stage's subset accumulation back into the frame buffers."""
    return (
        radiance_sum.at[idx].add(stage_radiance),
        lum_sq_sum.at[idx].add(stage_lum_sq),
        sample_count.at[idx].add(stage_count),
    )


def pick_stage_pixels(
    error_blocks: np.ndarray,
    width: int,
    height: int,
    budget_pixels: int,
    min_error: float = 1e-4,
) -> np.ndarray | None:
    """Host-side block selection: highest-error blocks fill the stage budget.

    Returns flat pixel indices (multiple of BLOCK² long) or None when
    converged (reference: adaptive_sampler_allocate_sample's stage slices).
    """
    hb, wb = error_blocks.shape
    flat = error_blocks.reshape(-1)
    order = np.argsort(-flat, kind="stable")
    num_blocks = min(max(budget_pixels // (BLOCK * BLOCK), 1), flat.size)
    chosen = order[:num_blocks]
    chosen = chosen[flat[chosen] > min_error]
    if chosen.size == 0:
        return None
    by, bx = np.divmod(chosen, wb)
    ys = (by[:, None, None] * BLOCK + np.arange(BLOCK)[None, :, None])
    xs = (bx[:, None, None] * BLOCK + np.arange(BLOCK)[None, None, :])
    pix = (ys * width + xs).reshape(-1)
    return pix[pix < width * height].astype(np.int32)


def allocate_stage_tasks(
    error_blocks: np.ndarray,
    width: int,
    height: int,
    avg_rate: int,
    max_rate: int = 32,
    min_error: float = 1e-4,
    budget_tasks: int | None = None,
):
    """Proportional per-block stage allocation (reference:
    adaptive_sampling.cuh:199-218 compute_stage_sample_counts + the
    prefix-sum task list of tasks_create_adaptive_sampling).

    Every unconverged block receives `clamp(round(err/avg_err * avg_rate),
    1, max_rate)` samples this stage; the returned task list repeats each
    block's pixels once per sample, highest-error blocks first, truncated
    to `budget_tasks`. Returns (pix, rank) — flat pixel indices plus each
    entry's occurrence rank (its 0-based extra-sample index within the
    stage) — or (None, None) when every block is converged.
    """
    flat = error_blocks.reshape(-1).astype(np.float64)
    unconverged = flat > min_error
    if not unconverged.any():
        return None, None
    # average over ALL blocks like the reference (avg_variance =
    # sum_variance / num_blocks) — converged regions pull it down so the
    # remaining hot blocks are weighted up
    avg_err = flat.mean()
    counts = np.rint(flat / max(avg_err, 1e-12) * avg_rate).astype(np.int64)
    counts = np.clip(counts, 1, max_rate)
    counts[~unconverged] = 0

    hb, wb = error_blocks.shape
    order = np.argsort(-flat, kind="stable")
    order = order[counts[order] > 0]
    if budget_tasks is not None:
        keep = np.searchsorted(
            np.cumsum(counts[order] * (BLOCK * BLOCK)),
            max(budget_tasks, BLOCK * BLOCK))
        order = order[: max(int(keep), 1)]

    by, bx = np.divmod(order, wb)
    ys = by[:, None, None] * BLOCK + np.arange(BLOCK)[None, :, None]
    xs = bx[:, None, None] * BLOCK + np.arange(BLOCK)[None, None, :]
    block_pix = (ys * width + xs).reshape(order.size, -1)  # [B, 16]

    reps = counts[order]
    pix = np.repeat(block_pix, reps, axis=0).reshape(-1)
    # occurrence rank: 0..reps_b-1 for each repetition of a block's pixels
    rank = np.concatenate(
        [np.repeat(np.arange(r), BLOCK * BLOCK) for r in reps]
    )
    valid = pix < width * height
    return pix[valid].astype(np.int32), rank[valid].astype(np.int64)
