"""ctypes bridge to the native C++ BVH builder.

Compiles bvh/cpp/builder.cpp on first use (g++, cached as libbvh.so next to
the source) and exposes :func:`build_bvh_native` with the same output
contract as the numpy builder. Falls back silently when no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..utils.log import info_message, warn_message
from .builder import BVH2

_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_SRC = os.path.join(_DIR, "builder.cpp")
_LIB = os.path.join(_DIR, "libbvh.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True,
                    capture_output=True,
                )
                info_message("built native BVH builder: %s", _LIB)
            lib = ctypes.CDLL(_LIB)
            lib.lum_build_bvh.restype = ctypes.c_int
            lib.lum_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.lum_build_wide.restype = ctypes.c_int
            lib.lum_build_wide.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except Exception as e:  # no toolchain / compile error → numpy fallback
            warn_message("native BVH builder unavailable (%s)", e)
            _lib_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_wide_native(corners: np.ndarray, flat_tris: int = 112):
    """Native direct 16-wide build — BVH2 + quality collapse in one C++ pass
    (bvh/cpp/builder.cpp lum_build_wide). Returns a WideBVH with leaf_rows
    left empty (filled by pack_leaf_rows), or None if unavailable.

    flat_tris: subtrees at or below this triangle count are flattened into
    one node of SAH-boundary leaf blocks (kills the thin-node tail the
    greedy python collapse produces). 112 measured best on the tree-tier
    bench (28/56/112/224 sweep, tools logs round 3).
    """
    lib = _load()
    if lib is None:
        return None
    from .wide import WIDE_LEAF, WideBVH

    corners = np.ascontiguousarray(corners, dtype=np.float32)
    t = int(corners.shape[0])
    node_cap = max(t // 4 + 16, 16)
    order_cap = (2 * t + 4 * WIDE_LEAF) // WIDE_LEAF * WIDE_LEAF + WIDE_LEAF
    node_rows = np.zeros((node_cap, 128), np.float32)
    tri_order = np.full((order_cap,), -1, np.int32)
    out_nodes = ctypes.c_int(0)
    out_blocks = ctypes.c_int(0)
    out_depth = ctypes.c_int(0)
    rc = lib.lum_build_wide(
        corners.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t, int(flat_tris),
        node_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tri_order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        node_cap, order_cap,
        ctypes.byref(out_nodes), ctypes.byref(out_blocks),
        ctypes.byref(out_depth),
    )
    if rc != 0:
        warn_message("native wide BVH build failed rc=%d; using fallback", rc)
        return None
    m, blocks = out_nodes.value, out_blocks.value
    return WideBVH(
        node_rows=node_rows[:m].copy(),
        leaf_rows=np.zeros((blocks, 128), np.float32),
        tri_order=tri_order[: blocks * WIDE_LEAF].copy(),
        depth=int(out_depth.value),
        num_nodes=m,
        num_blocks=blocks,
    )


def build_bvh_native(corners: np.ndarray, leaf_size: int = 4,
                     num_bins: int = 16) -> BVH2 | None:
    """Native binned-SAH build; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    corners = np.ascontiguousarray(corners, dtype=np.float32)
    t = int(corners.shape[0])
    node_cap = max(2 * t + 2, 4)
    order_cap = max(t + (t + leaf_size - 1), leaf_size) * 2

    child_min = np.zeros((node_cap, 2, 3), np.float32)
    child_max = np.zeros((node_cap, 2, 3), np.float32)
    child = np.full((node_cap, 2), BVH2.INVALID, np.int32)
    tri_order = np.full((order_cap,), -1, np.int32)
    out_nodes = ctypes.c_int(0)
    out_blocks = ctypes.c_int(0)

    rc = lib.lum_build_bvh(
        corners.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t, leaf_size, num_bins,
        child_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        child_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        child.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        tri_order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        node_cap, order_cap,
        ctypes.byref(out_nodes), ctypes.byref(out_blocks),
    )
    if rc != 0:
        warn_message("native BVH build failed rc=%d; using numpy builder", rc)
        return None

    n, blocks = out_nodes.value, out_blocks.value
    if t:
        lo = corners.min(axis=(0, 1))
        hi = corners.max(axis=(0, 1))
    else:
        lo = hi = np.zeros(3, np.float32)
    return BVH2(
        child_min=child_min[:n].copy(),
        child_max=child_max[:n].copy(),
        child=child[:n].copy(),
        tri_order=tri_order[: blocks * leaf_size].copy(),
        leaf_size=leaf_size,
        root_min=lo.astype(np.float32),
        root_max=hi.astype(np.float32),
    )
