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


def unplanar(rows: jnp.ndarray) -> jnp.ndarray:
    """[C, N] -> [N, C]: the inverse block transpose (same one-pass Pallas
    kernel, blocks cut along the N axis)."""
    from jax.experimental import pallas as pl

    c, n = rows.shape
    if not _use_pallas():
        return rows.T
    for gb in _BLOCKS:
        if n % gb == 0:
            break
    else:
        return rows.T
    return pl.pallas_call(
        _transpose_kernel,
        grid=(n // gb,),
        in_specs=[pl.BlockSpec((c, gb), lambda i: (0, i))],
        out_specs=pl.BlockSpec((gb, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), rows.dtype),
    )(rows)


def _make_select_kernel(n_cols: int, sub_stride: int):
    def kernel(x_ref, sub_ref, o_ref):
        xt = x_ref[...].T                     # [128, GB]
        sub = sub_ref[0:1]                    # [1, GB]
        for c in range(n_cols):
            v = xt[c * sub_stride:c * sub_stride + 1]
            for s in range(1, sub_stride):
                v = jnp.where(
                    sub == s, xt[c * sub_stride + s:c * sub_stride + s + 1],
                    v)
            o_ref[c:c + 1] = v
    return kernel


def gather_packed_planar(table: jnp.ndarray, slot: jnp.ndarray,
                         n_cols: int, sub_stride: int = 8) -> jnp.ndarray:
    """Packed-table fetch: table [P/sub, n_cols*sub] with slot s's logical
    col c at [s >> log2(sub), c*sub + (s & sub-1)] (device_scene._pack8) →
    planar [n_cols, N] logical rows.

    Fuses the transpose AND the sub-slot select into one Pallas pass: the
    XLA where-chain equivalent (device_scene.shp_col) re-streams 2 flat
    rows per select step — ~38 ms/sample at 1080p×4 depths — while here
    the whole 8→1 reduction happens in VREGs."""
    from jax.experimental import pallas as pl

    n = slot.shape[0]
    idx = slot >> 3 if sub_stride == 8 else slot // sub_stride
    sub = slot & (sub_stride - 1) if sub_stride == 8 else slot % sub_stride
    rows = table[idx]                          # [N, n_cols*sub] gather

    def _xla_select():
        xt = rows.T
        out = []
        for c in range(n_cols):
            v = xt[c * sub_stride]
            for s in range(1, sub_stride):
                v = jnp.where(sub == s, xt[c * sub_stride + s], v)
            out.append(v)
        return jnp.stack(out, axis=0)

    if not _use_pallas():
        return _xla_select()
    for gb in _BLOCKS:
        if n % gb == 0:
            break
    else:
        return _xla_select()
    c_all = table.shape[1]
    return pl.pallas_call(
        _make_select_kernel(n_cols, sub_stride),
        grid=(n // gb,),
        in_specs=[
            pl.BlockSpec((gb, c_all), lambda i: (i, 0)),
            pl.BlockSpec((1, gb), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((n_cols, gb), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n_cols, n), rows.dtype),
    )(rows, sub[None, :])
