"""ctypes binding for the native C++ SAH builder (native/bvh_builder.cpp).

The build is lazy: first use compiles the shared library with g++ into
``native/libgdpt_bvh.so`` (cached). If no toolchain is available the caller
falls back to the NumPy builder — both implement the identical algorithm
and are tested to produce bit-identical trees (tests/test_native_bvh.py).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "bvh_builder.cpp"
_LIB = _SRC.with_name("libgdpt_bvh.so")
_lock = threading.Lock()
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if (not _LIB.exists()
                    or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
                # -ffp-contract=off: no FMA contraction, so double
                # arithmetic rounds exactly like NumPy's and the trees
                # match the Python builder bit-for-bit.
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-ffp-contract=off",
                     "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(str(_LIB))
            f = lib.gdpt_build_blas
            f.restype = ctypes.c_int32
            f.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception:
            _load_failed = True
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def build_blas_native(tri_pos: np.ndarray, max_leaf: int = 4):
    """Build one mesh's BVH natively. `tri_pos`: (n, 3, 3) float32.

    Returns (node_min, node_max, left, right, first, count, order) with
    node arrays trimmed to the used count; `order` is the triangle
    permutation (BVH position i ← original triangle order[i]).
    Raises RuntimeError if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native BVH builder unavailable")
    tri = np.ascontiguousarray(tri_pos, dtype=np.float32).reshape(-1, 9)
    n = len(tri)
    cap = 2 * n
    node_min = np.zeros((cap, 3), np.float32)
    node_max = np.zeros((cap, 3), np.float32)
    left = np.zeros(cap, np.int32)
    right = np.zeros(cap, np.int32)
    first = np.zeros(cap, np.int32)
    count = np.zeros(cap, np.int32)
    order = np.zeros(n, np.int32)

    def fptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def iptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    n_nodes = lib.gdpt_build_blas(fptr(tri), n, max_leaf, fptr(node_min),
                                  fptr(node_max), iptr(left), iptr(right),
                                  iptr(first), iptr(count), iptr(order))
    if n_nodes < 0:
        raise RuntimeError(f"gdpt_build_blas failed: {n_nodes}")
    return (node_min[:n_nodes], node_max[:n_nodes], left[:n_nodes],
            right[:n_nodes], first[:n_nodes], count[:n_nodes], order)
