"""Native (C++) host components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; these are the host-side pieces
where Python is the bottleneck — currently the BVH builder (SURVEY §7:
"the one justified native component").  The shared library compiles
lazily with g++ on first use and caches in ~/.cache/mrt_native; every
native function has a pure-Python fallback, so absence of a toolchain
only costs speed.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

_LIB = None
_TRIED = False


def _find_source():
    here = os.path.dirname(os.path.abspath(__file__))
    for up in (os.path.dirname(here), os.path.dirname(os.path.dirname(here))):
        cand = os.path.join(up, "csrc", "bvh_builder.cpp")
        if os.path.exists(cand):
            return cand
    return None


def load():
    """Returns the native library or None (after one compile attempt)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MRT_NO_NATIVE"):
        return None
    src = _find_source()
    if src is None:
        return None
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                 "mrt_native")
        os.makedirs(cache_dir, exist_ok=True)
        lib_path = os.path.join(cache_dir, f"libmrt_{digest}.so")
        if not os.path.exists(lib_path):
            tmp = lib_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp, src],
                check=True, capture_output=True)
            os.replace(tmp, lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.mrt_bvh_build.restype = ctypes.c_int32
        lib.mrt_bvh_build.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        _LIB = lib
    except Exception as e:  # toolchain missing / compile failed
        print(f"mrt.native: falling back to python builders ({e})",
              file=sys.stderr)
        _LIB = None
    return _LIB


def bvh_build(centroids, bounds_min, bounds_max, leaf_size,
              split_mode=0):
    """Native mirror of geometry.bvh.build (split_mode 0 = median,
    1 = binned SAH); returns the same tuple or None when the native
    library is unavailable."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    n = centroids.shape[0]
    cent = np.ascontiguousarray(centroids, np.float64)
    bmin = np.ascontiguousarray(bounds_min, np.float64)
    bmax = np.ascontiguousarray(bounds_max, np.float64)
    cap = max(2 * n, 1)
    node_bmin = np.empty((cap, 3), np.float64)
    node_bmax = np.empty((cap, 3), np.float64)
    first = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    escape = np.empty(cap, np.int32)
    order = np.empty(n, np.int64)
    m = lib.mrt_bvh_build(
        cent.ctypes.data, bmin.ctypes.data, bmax.ctypes.data,
        n, leaf_size, split_mode,
        node_bmin.ctypes.data, node_bmax.ctypes.data,
        first.ctypes.data, count.ctypes.data, escape.ctypes.data,
        order.ctypes.data)
    return ((node_bmin[:m].astype(np.float32),
             node_bmax[:m].astype(np.float32),
             first[:m], count[:m], escape[:m]), order)
