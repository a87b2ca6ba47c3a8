"""Single-transfer device upload for pytrees.

On the tunneled TPU backend every host→device transfer costs seconds of
round-trip latency, so `jax.device_put(tree)` with ~50 leaves takes minutes.
This packs all leaves into ONE uint32 blob on the host, ships it with a single
transfer, and slices/bitcasts the leaves back out on device inside one jitted
executable (the staging-manager role of the reference, device_staging_manager.c,
solved at the transfer-count level instead).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _to_u32_view(arr: np.ndarray) -> tuple[np.ndarray, str]:
    """View any supported leaf as little-endian u32 words + a dtype tag."""
    a = np.ascontiguousarray(arr)
    if a.dtype == np.bool_:
        a = a.astype(np.uint32)
        tag = "bool"
    elif a.dtype in (np.float32, np.int32, np.uint32):
        tag = a.dtype.str
    elif a.dtype == np.float64:
        a = a.astype(np.float32)
        tag = "<f4"
    elif a.dtype == np.int64:
        a = a.astype(np.int32)
        tag = "<i4"
    else:
        raise TypeError(f"fast_device_put: unsupported dtype {a.dtype}")
    return a.view(np.uint32).reshape(-1), tag


def fast_device_put(tree):
    """device_put a pytree of numpy arrays with one host→device transfer."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    views = []
    metas = []  # (offset_words, num_words, shape, tag) — None = passthrough
    passthrough = {}
    offset = 0
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            # already on device (e.g. the baked sky env) — don't round-trip
            passthrough[i] = leaf
            metas.append(None)
            continue
        arr = np.asarray(leaf)
        v, tag = _to_u32_view(arr)
        metas.append((offset, v.size, arr.shape, tag))
        views.append(v)
        offset += v.size
    if not views:
        return tree
    blob = np.concatenate(views) if len(views) > 1 else views[0]
    blob_dev = jax.device_put(blob)  # the single transfer

    shapes_key = tuple(m for m in metas if m is not None)

    @partial(jax.jit, static_argnums=(1,))
    def unpack(blob, key):
        out = []
        for off, nwords, shape, tag in key:
            words = jax.lax.dynamic_slice(blob, (off,), (nwords,))
            if tag == "bool":
                leaf = (words != 0).reshape(shape)
            elif tag == "<f4":
                leaf = jax.lax.bitcast_convert_type(words, jnp.float32).reshape(shape)
            elif tag == "<i4":
                leaf = jax.lax.bitcast_convert_type(words, jnp.int32).reshape(shape)
            else:  # "<u4"
                leaf = words.reshape(shape)
            out.append(leaf)
        return tuple(out)

    unpacked = iter(unpack(blob_dev, shapes_key))
    new_leaves = [
        passthrough[i] if m is None else next(unpacked)
        for i, m in enumerate(metas)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
