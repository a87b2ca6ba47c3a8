"""Disk cache for packed DeviceScenes (perf-tool iteration aid).

Scene packing (BVH build + flatten + table packing) is pure CPU work that
repeats identically across every perf-tool run on the same procedural
scene — several minutes per run on a single-core bench host. The cache
pickles the DeviceScene pytree's numpy leaves keyed by an explicit name
the caller owns (the tools' scenes are deterministic builders, so the
name + a layout version is the fingerprint).

Usage:
    from pack_cache import cached_pack
    ds = cached_pack("sphere_grid_19x19", lambda: pack_scene(scene))

Bump _LAYOUT_V when any device-table layout changes so stale caches miss.
Tools only — the product Renderer keeps its dirty-flag incremental pack.
"""

import os
import pickle

import numpy as np

_DIR = os.path.expanduser("~/.cache/luminary_tpu_packs")
_LAYOUT_V = 1


def cached_pack(name: str, build):
    import jax

    os.makedirs(_DIR, exist_ok=True)
    path = os.path.join(_DIR, f"{name}_v{_LAYOUT_V}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                leaves, treedef = pickle.load(f)
            return jax.tree_util.tree_unflatten(
                treedef, [jax.numpy.asarray(x) if isinstance(x, np.ndarray)
                          else x for x in leaves])
        except Exception as e:  # stale/corrupt cache: rebuild
            print(f"pack_cache: rebuild ({e})", flush=True)
    ds = build()
    leaves, treedef = jax.tree_util.tree_flatten(ds)
    host = [np.asarray(x) if hasattr(x, "dtype") else x for x in leaves]
    with open(path, "wb") as f:
        pickle.dump((host, treedef), f, protocol=4)
    return ds
