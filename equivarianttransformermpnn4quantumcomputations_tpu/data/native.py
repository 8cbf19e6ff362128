"""ctypes bridge to the C++ neighbor-list builder (csrc/neighborlist.cpp).

Compiles the shared library on first use (g++, cached next to the source);
falls back to the numpy implementation in data/graph.py when no compiler is
available.  The C++ path is ~2 orders of magnitude faster than the numpy
27-image sweep and keeps the host input pipeline off the training critical
path on single-core hosts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["native_available", "neighbor_list_native"]

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _csrc_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc",
    )


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_csrc_dir(), "neighborlist.cpp")
        lib_path = os.path.join(_csrc_dir(), "libneighborlist.so")
        try:
            if not os.path.exists(lib_path) or os.path.getmtime(
                lib_path
            ) < os.path.getmtime(src):
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC",
                        "-o", lib_path + ".tmp", src,
                    ],
                    check=True,
                    capture_output=True,
                )
                os.replace(lib_path + ".tmp", lib_path)
            lib = ctypes.CDLL(lib_path)
            fn = lib.etq_neighbor_list
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # pos
                ctypes.c_int64,                   # n
                ctypes.POINTER(ctypes.c_double),  # cell
                ctypes.c_int32,                   # pbc
                ctypes.c_double,                  # cutoff
                ctypes.c_int64,                   # max_neighbors
                ctypes.POINTER(ctypes.c_int64),   # out_src
                ctypes.POINTER(ctypes.c_int64),   # out_dst
                ctypes.POINTER(ctypes.c_int32),   # out_shift
                ctypes.c_int64,                   # capacity
            ]
            _LIB = fn
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _load() is not None


def neighbor_list_native(
    pos: np.ndarray,
    cell: np.ndarray | None,
    pbc: bool,
    cutoff: float,
    max_neighbors: int | None,
):
    """Returns (src [E], dst [E], shift [E,3]) or None if unavailable."""
    fn = _load()
    if fn is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    n = pos.shape[0]
    cell_arr = (
        np.ascontiguousarray(cell, dtype=np.float64)
        if cell is not None
        else np.zeros((3, 3))
    )
    cap = max(64, n * (27 if pbc else 1) * 64)
    src = np.empty(cap, dtype=np.int64)
    dst = np.empty(cap, dtype=np.int64)
    shift = np.empty((cap, 3), dtype=np.int32)
    while True:
        total = fn(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            cell_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            1 if pbc else 0,
            float(cutoff),
            -1 if max_neighbors is None else int(max_neighbors),
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            shift.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
        )
        if total <= cap:
            return src[:total], dst[:total], shift[:total]
        cap = int(total)
        src = np.empty(cap, dtype=np.int64)
        dst = np.empty(cap, dtype=np.int64)
        shift = np.empty((cap, 3), dtype=np.int32)
