"""Native (C++) data-path kernels, loaded via ctypes.

The reference's input pipeline rides torchvision/DataLoader's C++ internals
(`mnist/data_utils.py:15,27`); this package is the cfgan equivalent: an IDX
decoder and a multithreaded uint8->float32 normalizer compiled from
`idx_loader.cpp` on first use (g++, no pip deps).  Everything degrades to
the pure-Python implementations in `cfgan.data.mnist` when no compiler or
prebuilt `.so` is available — `lib()` returns None in that case.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "idx_loader.cpp")
_SO = os.path.join(_DIR, "idx_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def lib():
    """The loaded ctypes library, building it on first use; None when
    unavailable (callers must fall back to Python)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError:
            return None
        L.idx_read.restype = ctypes.c_int
        L.idx_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
        ]
        L.u8_to_f32_norm.restype = None
        L.u8_to_f32_norm.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_float,
            ctypes.c_float,
        ]
        _lib = L
        return _lib


def read_idx(path: str) -> np.ndarray | None:
    """Native IDX read; None on any failure (caller falls back)."""
    L = lib()
    if L is None or path.endswith(".gz"):
        return None
    try:  # peek the header to allocate the exact payload size
        with open(path, "rb") as f:
            head = f.read(4)
            if len(head) != 4 or head[0] or head[1] or head[2] != 0x08:
                return None
            ndims = head[3]
            if not 1 <= ndims <= 8:  # dims buffer below has 8 slots
                return None
            shape = tuple(
                int.from_bytes(f.read(4), "big") for _ in range(ndims)
            )
    except OSError:
        return None
    n = int(np.prod(shape))
    out = np.empty(n, np.uint8)
    dims = (ctypes.c_longlong * 8)()
    ndim = ctypes.c_int(0)
    rc = L.idx_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, dims, ctypes.byref(ndim),
    )
    if rc != 0:
        return None
    return out.reshape(shape)


def normalize_u8(x: np.ndarray, mean: float, std: float) -> np.ndarray | None:
    """(x/255 - mean)/std as float32 via the native kernel; None -> fall
    back to numpy."""
    L = lib()
    if L is None:
        return None
    x = np.ascontiguousarray(x, np.uint8)
    out = np.empty(x.shape, np.float32)
    L.u8_to_f32_norm(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size, ctypes.c_float(mean), ctypes.c_float(std),
    )
    return out
