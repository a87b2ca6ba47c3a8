"""Planar row-gather: fetch wide table rows and hand them out lanes-major.

A `table[idx]` gather yields an [N, C] array whose minor axis pads to 128
lanes, so EVERY consumer fusion that reads a column re-streams the full
padded tile array from HBM (~5 ms per pass at 2M lanes — measured,
tools/microbench_colext.py). The round-4 profile showed these post-gather
extraction passes, not the gathers, dominating the shade/lights/aerial
clusters.

The fix is one cheap Pallas block-transpose right after the gather: the
[N, C] rows become a planar [C, N] array, and each consumer then reads
only the flat [N] component rows it needs. Measured at 2M lanes on the
[164k, 48] shade table (microbench_colext patterns):

    A  10 column-read consumer fusions     69 ms   (the old pattern)
    B  XLA transpose + row slices          70 ms   (XLA relayout ~= 10 passes)
    F  Pallas transpose + row slices       31 ms   (gather alone: 25 ms)

The reference streams packed structs per thread through L1/registers
(device_utils.h DeviceTaskState float4 chunks); this is the TPU analog —
one coalesced pass into a layout whose reads are free thereafter.

On non-TPU backends (CPU tests, multichip dryrun) the helper falls back
to `table[idx].T` — identical numerics, no Mosaic dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .traverse import _use_pallas

# Lane-axis block of the transpose kernel. Wavefront chunks are rounded to
# multiples of 256 (renderer.py chunk selection), so 256 always divides the
# lane count; larger blocks just amortize grid steps when they fit.
_BLOCKS = (4096, 2048, 1024, 512, 256)


def _transpose_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


def planar(rows: jnp.ndarray) -> jnp.ndarray:
    """[N, C] -> [C, N] via a Pallas block transpose (XLA `.T` on a
    padded-tile row array costs ~10 full passes; this is ~one)."""
    from jax.experimental import pallas as pl

    n, c = rows.shape
    if not _use_pallas():
        return rows.T
    for gb in _BLOCKS:
        if n % gb == 0:
            break
    else:
        return rows.T  # odd lane count (tools / tests): correctness first
    return pl.pallas_call(
        _transpose_kernel,
        grid=(n // gb,),
        in_specs=[pl.BlockSpec((gb, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((c, gb), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c, n), rows.dtype),
    )(rows)


def gather_planar(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [P, C], idx [N] -> planar [C, N] component rows."""
    return planar(table[idx])
