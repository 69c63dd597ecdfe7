"""ctypes loader/builder for the native C++ BVH builder (accel/cpp).

Compiles libbvh.so on first use with g++ (no pybind11 in this image — plain
C ABI + ctypes, per the framework's native-runtime policy).  Falls back to
the numpy builder transparently if no compiler is available.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("libyafaray_tpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "bvh_builder.cpp")
_SO = os.path.join(_HERE, "cpp", "libbvh.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
                log.info("built native BVH builder: %s", _SO)
            lib = ctypes.CDLL(_SO)
            lib.lyt_build_bvh.restype = ctypes.c_int
            lib.lyt_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float)] * 3 + [ctypes.c_int] + [
                ctypes.POINTER(ctypes.c_float)] * 2 + [
                ctypes.POINTER(ctypes.c_int)] * 5
            _lib = lib
        except Exception as e:  # noqa: BLE001 — fall back to numpy
            log.warning("native BVH builder unavailable (%s); numpy fallback",
                        e)
            _lib = None
        return _lib


def build_bvh_native(v0: np.ndarray, e1: np.ndarray,
                     e2: np.ndarray) -> dict | None:
    """Same output dict as accel.bvh.build_bvh, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = v0.shape[0]
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    cap = 2 * t
    bb_min = np.empty((cap, 3), np.float32)
    bb_max = np.empty((cap, 3), np.float32)
    hit_next = np.empty(cap, np.int32)
    miss_next = np.empty(cap, np.int32)
    first_tri = np.empty(cap, np.int32)
    tri_count = np.empty(cap, np.int32)
    tri_order = np.empty(t, np.int32)

    def p_f(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def p_i(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

    n_nodes = lib.lyt_build_bvh(
        p_f(v0), p_f(e1), p_f(e2), t,
        p_f(bb_min), p_f(bb_max), p_i(hit_next), p_i(miss_next),
        p_i(first_tri), p_i(tri_count), p_i(tri_order),
    )
    if n_nodes <= 0:
        return None
    return dict(
        bb_min=bb_min[:n_nodes], bb_max=bb_max[:n_nodes],
        hit_next=hit_next[:n_nodes], miss_next=miss_next[:n_nodes],
        first_tri=first_tri[:n_nodes], tri_count=tri_count[:n_nodes],
        tri_order=tri_order,
    )
