"""ctypes bridge to the native SAH BVH builder (bvh_builder.cpp).

Compiles the shared library on first use with g++ (no pip deps), caches the
.so next to this file, and exposes `build_bvh_native` with the same SoA
output contract as tinsel_tpu.accel.build.build_bvh.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bvh_builder.cpp")
_SO = os.path.join(_HERE, "libtinselbvh.so")
_lock = threading.Lock()
_lib = None


def _ensure_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            cmd = [
                "g++",
                "-O3",
                "-shared",
                "-fPIC",
                "-std=c++17",
                _SRC,
                "-o",
                _SO + ".tmp",
            ]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(_SO + ".tmp", _SO)
        lib = ctypes.CDLL(_SO)
        lib.tinsel_build_bvh.restype = ctypes.c_int32
        lib.tinsel_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    return _lib


def build_bvh_native(lowers: np.ndarray, uppers: np.ndarray, leaf_size: int = 8):
    from ..accel.build import BVH

    lib = _ensure_lib()
    lowers = np.ascontiguousarray(lowers, np.float32)
    uppers = np.ascontiguousarray(uppers, np.float32)
    n = lowers.shape[0]
    cap = 2 * n
    out_lower = np.empty((cap, 3), np.float32)
    out_upper = np.empty((cap, 3), np.float32)
    out_left = np.empty(cap, np.int32)
    out_right = np.empty(cap, np.int32)
    out_leaf = np.empty(cap, np.int32)
    out_count = np.empty(cap, np.int32)
    out_perm = np.empty(n, np.int32)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    used = lib.tinsel_build_bvh(
        fptr(lowers), fptr(uppers), ctypes.c_int64(n),
        ctypes.c_int32(leaf_size),
        fptr(out_lower), fptr(out_upper),
        iptr(out_left), iptr(out_right), iptr(out_leaf),
        iptr(out_count), iptr(out_perm),
    )
    if used <= 0:
        raise RuntimeError("native BVH build failed")
    return BVH(
        lower=out_lower[:used].copy(),
        upper=out_upper[:used].copy(),
        left=out_left[:used].copy(),
        right=out_right[:used].copy(),
        leaf=out_leaf[:used].copy(),
        count=out_count[:used].copy(),
        perm=out_perm,
    )


def collapse_wide_native(bvh, k: int = 4, block_size: int = 16):
    """Native fast path for accel.build.build_wide_bvh (bit-identical to
    the NumPy collapse; ~20x faster on a 524k-tri tree). Returns a WideBVH
    or raises on unsupported input (root-leaf trees use the Python path)."""
    from ..accel.build import WideBVH, _node_layout

    if k not in (4, 8, 16):
        raise ValueError(f"native collapse: unsupported k={k}")
    NODE_ROW_WIDTH, _, _ = _node_layout(k)

    lib = _ensure_lib()
    if not hasattr(lib, "tinsel_collapse_wide"):
        lib.tinsel_collapse_wide.restype = ctypes.c_int64
    lib.tinsel_collapse_wide.restype = ctypes.c_int64
    lib.tinsel_collapse_wide.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
    ]

    n = bvh.num_nodes
    lower = np.ascontiguousarray(bvh.lower, np.float32)
    upper = np.ascontiguousarray(bvh.upper, np.float32)
    left = np.ascontiguousarray(bvh.left, np.int32)
    right = np.ascontiguousarray(bvh.right, np.int32)
    count = np.ascontiguousarray(bvh.count, np.int32)
    perm = np.ascontiguousarray(bvh.perm, np.int32)

    out_rows = np.zeros((n, NODE_ROW_WIDTH), np.float32)
    out_perm = np.zeros(n * block_size, np.int64)
    out_mask = np.zeros(n * block_size, np.uint8)
    out_counts = np.zeros(2, np.int64)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.tinsel_collapse_wide(
        fptr(lower), fptr(upper), iptr(left), iptr(right), iptr(count),
        iptr(perm), ctypes.c_int64(n), ctypes.c_int32(k),
        ctypes.c_int32(block_size),
        fptr(out_rows),
        out_perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc <= 0:
        raise RuntimeError("native wide collapse failed")
    n_int, n_blocks = int(out_counts[0]), int(out_counts[1])
    return WideBVH(
        node_rows=out_rows[:n_int].copy(),
        perm_padded=out_perm[: n_blocks * block_size].copy(),
        real_mask=out_mask[: n_blocks * block_size].astype(bool),
        root_lower=lower[0].copy(),
        root_upper=upper[0].copy(),
        k=k,
    )
