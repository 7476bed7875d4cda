"""ctypes binding for the native C++ chunk-gather kernel (csrc/gather.cpp).

The shared library is compiled lazily with g++ on first use and cached next
to the source; every caller degrades gracefully to the NumPy fancy-indexing
path when no compiler is available.  (pybind11 is not shipped in this
image, hence ctypes — see csrc/gather.cpp.)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc", "gather.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "csrc", "libmrssm_gather.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            # A failed rebuild (no compiler, read-only install dir) is not
            # fatal when a prebuilt library is already present (e.g. shipped
            # in the wheel): fall through and try loading it.
            if not _build() and not os.path.exists(_LIB):
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.mrssm_gather_chunks.restype = ctypes.c_int
            lib.mrssm_gather_chunks.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_void_p, ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _failed = True
    return _lib


def gather_chunks(
    src: np.ndarray, idxs: np.ndarray, num_threads: int = 0
) -> np.ndarray:
    """Gather buffer rows time-major: src [N, ...] + idxs [n, L] ->
    [L, n, ...].  Uses the threaded native kernel when it can win (>= 2
    host cores), else NumPy fancy indexing."""
    n, L = idxs.shape
    lib = get_lib() if (num_threads > 1 or (os.cpu_count() or 1) > 1) else None
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        vec = idxs.transpose().reshape(-1)
        return src[vec].reshape(L, n, *src.shape[1:])

    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 8)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    out = np.empty((L, n, *src.shape[1:]), src.dtype)
    idx64 = np.ascontiguousarray(idxs, np.int64)
    rc = lib.mrssm_gather_chunks(
        src.ctypes.data_as(ctypes.c_void_p), src.shape[0], row_bytes,
        idx64.ctypes.data_as(ctypes.c_void_p), n, L,
        out.ctypes.data_as(ctypes.c_void_p), num_threads,
    )
    if rc != 0:
        raise IndexError("gather index out of range")
    return out
